from .postproc import (vorticity, q_criterion, delta_criterion,
                       swirling_strength, omega_criterion, kinetic_energy,
                       enstrophy, energy_budget, RunningStats, drag_lift,
                       torque, forces_and_torque, ZeroCrossing)
from .sensitivity import (biorthogonalize, wavemaker, bf_sensitivity,
                          steady_force_sensitivity, delta_forcing)
from .monitor import RunMonitor, WatchdogError, cfl
from .outpost import outpost_ks
from .postproc3d import (vorticity3, q_criterion3, lambda2_criterion3,
                         delta_criterion3, swirling_strength3,
                         omega_criterion3)

__all__ = [
    "vorticity", "q_criterion", "delta_criterion", "swirling_strength",
    "omega_criterion", "kinetic_energy", "enstrophy", "energy_budget",
    "RunningStats", "drag_lift", "torque", "forces_and_torque",
    "ZeroCrossing",
    "biorthogonalize", "wavemaker", "bf_sensitivity",
    "steady_force_sensitivity", "delta_forcing",
    "RunMonitor", "WatchdogError", "cfl", "outpost_ks",
    "vorticity3", "q_criterion3", "lambda2_criterion3",
    "delta_criterion3", "swirling_strength3", "omega_criterion3",
]
