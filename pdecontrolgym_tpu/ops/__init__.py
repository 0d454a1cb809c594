from pdecontrolgym_tpu.ops.tridiag import pcr, thomas

__all__ = ["pcr", "thomas"]
