from .cylinder import cylinder_mesh, cylinder_system
from .cavity import cavity_system
from .channel import channel_system
from .bfs import bfs_mesh, bfs_system

__all__ = ["cylinder_mesh", "cylinder_system", "cavity_system",
           "channel_system", "bfs_mesh", "bfs_system"]
