from .cylinder import cylinder_mesh, cylinder_system, cylinder_reference_system
from .cavity import cavity_system
from .channel import channel_system
from .bfs import bfs_mesh, bfs_system, bfs_reference_system
from .thermosyphon import thermosyphon_system, conduction_ic
from .flipflop import flipflop_mesh, flipflop_system
from .jet import jet_system, jet_ic, pulse_wave, rjet_profile, jet_reference_system

__all__ = ["cylinder_mesh", "cylinder_system", "cylinder_reference_system", "cavity_system",
           "channel_system", "bfs_mesh", "bfs_system", "bfs_reference_system", "thermosyphon_system",
           "conduction_ic", "flipflop_mesh", "flipflop_system",
           "jet_system", "jet_ic", "pulse_wave", "rjet_profile", "jet_reference_system"]
