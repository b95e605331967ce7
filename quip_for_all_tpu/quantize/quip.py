"""Per-layer QuIP# quantization driver.

Parity target: ``/root/reference/quip.py`` (class QUIP: add_batch + quant).
Functional: heavy math (incoherence transforms, LDLQ) runs as jitted JAX with
float32-highest matmuls; orchestration (Cholesky retries, packing) is host
side. Differences from the reference are TPU-motivated and behavior-neutral:
fp32 Kahan Hessians instead of fp64 (quantize/hessian.py), and Cholesky in
host float64 (free on CPU) instead of escalating-regularization-only.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codebooks import Codebook
from ..nn.qlinear import QuantLinearParams
from ..ops.qtensor import from_raw_idxs
from ..transforms.incoherence import (
    HadSpec, get_hadK, matmul_hadU, matmul_hadUt)
from .ldlq import ldlq

logger = logging.getLogger(__name__)

_PREC = jax.lax.Precision.HIGHEST


@dataclasses.dataclass
class QuantConfig:
    """Knobs of the reference QUIP.quant() (``quip.py:71-79``) +
    QuipQuantizer defaults (``quantizer.py:58-89``)."""
    rescale_WH: bool = False
    sigma_reg: float = 0.01
    scale_override: float = -1.0
    use_rand: bool = True
    per_channel: bool = False
    quip_tune_iters: int = 10


@dataclasses.dataclass
class LayerQuantAttrs:
    """What quantizing one linear layer produces (parity: the attr dict at
    ``quip.py:173-183``)."""
    Qidxs_raw: np.ndarray          # (q_out, q_in/codesz) int32 raw codes
    w_scale: np.ndarray            # () or (q_out, 1)
    SU: np.ndarray                 # (in,) signs (or merged-in scale vector)
    SV: np.ndarray                 # (out,)
    left_spec: HadSpec
    right_spec: HadSpec
    merge_su: bool
    merge_sv: bool
    scaleWH: Optional[np.ndarray]  # (in,) when rescale_WH


def _transform_H(H, SU, lspec):
    Hs = H * SU[None, :]
    Hs = matmul_hadUt(Hs, lspec)
    Hs = Hs.T * SU[None, :]
    return matmul_hadUt(Hs, lspec)


def _transform_W(W, SU, SV, lspec, rspec):
    Ws = W.T * SV[None, :]
    Ws = matmul_hadUt(Ws, rspec)
    Ws = Ws.T * SU[None, :]
    return matmul_hadUt(Ws, lspec)


def _reconstruct(hatW, SU, SV, lspec, rspec, n_in, n_out):
    w = matmul_hadU(hatW, lspec)[..., :n_in] * SU[None, :]
    w = matmul_hadU(w.T, rspec)[..., :n_out] * SV[None, :]
    return w.T


def quantize_layer(
    W: np.ndarray,
    H: np.ndarray,
    cb: Codebook,
    cfg: QuantConfig,
    rng: np.random.Generator,
    SU: Optional[np.ndarray] = None,
    SV: Optional[np.ndarray] = None,
    lspec: Optional[HadSpec] = None,
    rspec: Optional[HadSpec] = None,
    su_is_merged: Optional[bool] = None,
    sv_is_merged: Optional[bool] = None,
) -> Tuple[LayerQuantAttrs, np.ndarray]:
    """Quantize one linear layer.

    W: (out, in) float; H: (in, in) input second moment.
    SU/SV: optional externally-merged sign vectors (merge_suv mode).
    lspec/rspec: optional transform overrides (e.g. block-diagonal
    tensor-parallel factors from get_hadK(..., shards=tp)).
    Returns (attrs, W_hat_dense (out, in) float32) — the dense reconstruction
    feeds subsequent-block Hessians and finetune, mirroring ``quip.py:163-171``.
    """
    W = np.asarray(W, dtype=np.float32)
    H = np.asarray(H, dtype=np.float32).copy()
    n_out, n_in = W.shape

    # dead-column patching (quip.py:90-92)
    dead = np.diag(H) == 0
    H[dead, dead] = 1.0
    W = W.copy()
    W[:, dead] = 0.0

    H /= np.mean(np.diag(H))

    scaleWH = None
    if cfg.rescale_WH:
        H /= np.abs(H).max()
        diagH = np.clip(np.diag(H), 1e-8, None)
        diagW2 = np.clip((W * W).sum(axis=0), 1e-8, None)
        scaleWH = np.clip(np.sqrt(np.sqrt(diagH / diagW2)), 1e-8, None
                          ).astype(np.float32)
        W = W * scaleWH[None, :]
        H = H / scaleWH[None, :]
        H = H / scaleWH[:, None]

    merge_su = (SU is not None) if su_is_merged is None else su_is_merged
    merge_sv = (SV is not None) if sv_is_merged is None else sv_is_merged
    if SU is None:
        SU = np.sign(rng.standard_normal(n_in) + 1e-5).astype(np.float32)
    if SV is None:
        SV = np.sign(rng.standard_normal(n_out) + 1e-5).astype(np.float32)

    if lspec is None:
        lspec = get_hadK(n_in, use_rand=cfg.use_rand, rng=rng)
    if rspec is None:
        rspec = get_hadK(n_out, use_rand=cfg.use_rand, rng=rng)

    Hr = np.asarray(_transform_H(jnp.asarray(H), jnp.asarray(SU), lspec))
    Wr = np.asarray(_transform_W(jnp.asarray(W), jnp.asarray(SU),
                                 jnp.asarray(SV), lspec, rspec))

    # Cholesky with escalating regularization (quip.py:129-141), computed in
    # host float64.
    Hr64 = Hr.astype(np.float64)
    L = None
    for attempt in range(10):
        Hr64[np.diag_indices_from(Hr64)] += cfg.sigma_reg
        try:
            L = np.linalg.cholesky(Hr64)
            if np.any(np.isnan(L)):
                raise np.linalg.LinAlgError
            break
        except np.linalg.LinAlgError:
            logger.warning("Cholesky failed (attempt %d), escalating "
                           "sigma_reg", attempt + 1)
            L = None
    if L is None:
        raise ValueError("Hessian is not invertible")
    Hr = Hr64.astype(np.float32)

    if cfg.per_channel:
        w_scale = np.sqrt((Wr * Wr).mean(axis=1, keepdims=True))
    else:
        w_scale = np.asarray(np.sqrt((Wr * Wr).mean()))
    if cfg.scale_override > 0:
        w_scale = w_scale / cfg.scale_override
    else:
        w_scale = w_scale / cb.opt_scale
    Wr_scaled = Wr / w_scale

    hatWr, Qidxs = ldlq(jnp.asarray(Wr_scaled), jnp.asarray(Hr),
                        jnp.asarray(L.astype(np.float32)), cb,
                        cfg.quip_tune_iters)
    hatWr = np.asarray(hatWr) * w_scale

    W_hat = np.asarray(_reconstruct(
        jnp.asarray(hatWr), jnp.asarray(SU), jnp.asarray(SV),
        lspec, rspec, n_in, n_out))
    if cfg.rescale_WH:
        W_hat = W_hat / scaleWH[None, :]

    attrs = LayerQuantAttrs(
        Qidxs_raw=np.asarray(Qidxs, dtype=np.int64).astype(
            np.uint32).view(np.int32),
        w_scale=np.asarray(w_scale, dtype=np.float32),
        SU=SU, SV=SV,
        left_spec=lspec, right_spec=rspec,
        merge_su=merge_su, merge_sv=merge_sv,
        scaleWH=scaleWH,
    )
    return attrs, W_hat.astype(np.float32)


def pack_to_qlinear(attrs: LayerQuantAttrs, cb: Codebook,
                    bias: Optional[np.ndarray] = None,
                    per_channel: bool = False) -> QuantLinearParams:
    """Build runtime QuantLinearParams from quantization attrs.

    Combines the reference's QuantLinear.pack (``qlinear.py:117-142``) with
    the load-time perf fixups (``quantizer.py:836-844``): wscale_float =
    mean(Wscale) is made static, per-channel Wscale is pre-normalized, and
    all-positive SU/SV (merged case) are dropped.
    """
    lspec, rspec = attrs.left_spec, attrs.right_spec
    n_in, n_out = attrs.SU.shape[0], attrs.SV.shape[0]

    # NOTE: with rescale_WH the codes approximate W·scaleWH, so the runtime
    # input must be DIVIDED by scaleWH (consistent with the reconstruction at
    # the reference's quip.py:166-167). The reference's pack multiplies
    # instead (qlinear.py:118-121), which makes its rescale_WH inference off
    # by scaleWH^2; we implement the correct direction.
    if attrs.scaleWH is not None and not attrs.merge_su:
        SU = attrs.SU / attrs.scaleWH
    elif attrs.scaleWH is not None:
        SU = 1.0 / attrs.scaleWH
    elif not attrs.merge_su:
        SU = attrs.SU
    else:
        SU = None
    SV = None if attrs.merge_sv else attrs.SV
    if SU is not None and np.all(SU > 0) and np.all(SU == 1.0):
        SU = None
    if SV is not None and np.all(SV == 1.0):
        SV = None

    ws = attrs.w_scale.reshape(-1)
    wscale_float = float(ws.mean())
    Wscale = None
    if per_channel:
        Wscale = jnp.asarray((ws / ws.mean()).astype(np.float32))

    if bias is not None and attrs.merge_sv:
        bias = bias / attrs.SV

    qt = from_raw_idxs(cb, attrs.Qidxs_raw, rspec.padN, lspec.padN)
    return QuantLinearParams(
        qweight=qt,
        Wscale=Wscale,
        SU=None if SU is None else jnp.asarray(SU.astype(np.float32)),
        SV=None if SV is None else jnp.asarray(SV.astype(np.float32)),
        bias=None if bias is None else jnp.asarray(
            np.asarray(bias, dtype=np.float32)),
        had_left=None if lspec.hadK is None else jnp.asarray(lspec.hadK),
        had_right=None if rspec.hadK is None else jnp.asarray(rspec.hadK),
        in_features=n_in, out_features=n_out,
        K_left=lspec.K, K_right=rspec.K,
        q_in=lspec.padN, q_out=rspec.padN,
        per_channel=per_channel,
        wscale_float=wscale_float,
        shards_left=lspec.shards, shards_right=rspec.shards,
    )
