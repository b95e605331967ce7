"""Codebook registry — parity with ``/root/reference/codebook/__init__.py``."""
from .base import Codebook, nearest_codeword
from .d4 import D4
from .e8p12 import E8P12
from .e8p12_rvq3 import E8P12RVQ3B
from .e8p12_rvq4 import E8P12RVQ4B
from .hi import HI4B1C


def get_codebook(name: str, opt_resid_scale: float | None = None) -> Codebook:
    """Instantiate a codebook by id. ``opt_resid_scale`` < 0 or None keeps
    the per-codebook default (matching ``quantizer.py:126-127`` semantics)."""
    if name not in codebook_id:
        raise ValueError(
            f"Invalid codebook {name!r}; choose from {sorted(codebook_id)}")
    cls = codebook_id[name]
    if name in ("E8P12RVQ3B", "E8P12RVQ4B") and opt_resid_scale is not None \
            and opt_resid_scale > 0:
        return cls(opt_resid_scale=opt_resid_scale)
    return cls()


codebook_id = {
    "D4": D4,
    "E8P12": E8P12,
    "HI": HI4B1C,
    "E8P12RVQ3B": E8P12RVQ3B,
    "E8P12RVQ4B": E8P12RVQ4B,
}

__all__ = [
    "Codebook", "D4", "E8P12", "E8P12RVQ3B", "E8P12RVQ4B", "HI4B1C",
    "codebook_id", "get_codebook", "nearest_codeword",
]
