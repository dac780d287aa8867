from .direct import HostDirect

__all__ = ["HostDirect"]
