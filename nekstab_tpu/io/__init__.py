from .checkpoint import (save_field, load_field, save_arnoldi, load_arnoldi,
                         make_arnoldi_checkpointer)
from .spectra import write_spectre, AsciiSeries, write_run_info
from .nekfile import read_fld, write_fld
from .re2 import read_re2, mesh_from_re2

__all__ = ["save_field", "load_field", "save_arnoldi", "load_arnoldi",
           "make_arnoldi_checkpointer", "write_spectre", "AsciiSeries",
           "write_run_info", "read_fld", "write_fld", "read_re2",
           "mesh_from_re2"]
