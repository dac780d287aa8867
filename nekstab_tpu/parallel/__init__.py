from .spmd import (ShardedFlowSystem, context_specs, case_specs, state_specs,
                   vel_spec, make_device_mesh)

__all__ = ["ShardedFlowSystem", "context_specs", "case_specs", "state_specs",
           "vel_spec", "make_device_mesh"]
