"""External feature terms for cluster subspaces."""

from smol_tpu.cofe.extern.ewald import EwaldTerm

__all__ = ["EwaldTerm"]
