from .checkpoint import (save_field, load_field, save_arnoldi, load_arnoldi,
                         make_arnoldi_checkpointer)
from .spectra import write_spectre, AsciiSeries, write_run_info

__all__ = ["save_field", "load_field", "save_arnoldi", "load_arnoldi",
           "make_arnoldi_checkpointer", "write_spectre", "AsciiSeries",
           "write_run_info"]
