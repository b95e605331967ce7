"""Runtime sanitizer: determinism, purity, finiteness, and kernel-parity
checks for compiled TPU programs.

Role: the TPU-native analog of CUDA's `compute-sanitizer` race/initcheck
tools (the reference ships none — SURVEY.md §5 lists race detection as a
gap on both sides). On TPU the failure modes worth guarding are not
shared-memory data races (XLA programs are data-race-free by
construction) but their moral equivalents:

  * nondeterministic lowerings (scatter-add reduction order, collective
    ordering, autotuner flakiness) -> `check_determinism` runs a program
    repeatedly on bit-identical inputs and bit-compares every output
    leaf;
  * host-side buffer aliasing / in-place mutation (a C extension or
    ctypes path scribbling on an input, donated-buffer reuse) ->
    `check_purity` snapshots every input leaf and verifies the call
    left them untouched;
  * numerics blowups that a benchmark would silently average over ->
    `check_finite` walks a pytree for NaN/Inf;
  * miscompiled kernel variants (Mosaic legalization bugs produce wrong
    *values*, not crashes — see docs/BYTECUT.md sw2/sw4) ->
    `check_variant_parity` decodes a QuantizedTensor through every
    trace-time kernel-variant knob and bit-compares against the XLA
    reference decode (`ops/dequant_xla.py:143`).

All checks return a `SanitizerReport`; nothing raises unless
``strict=True``. CLI driver: ``tools/sanitize.py``.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import numpy as np


@dataclasses.dataclass
class Finding:
    check: str
    leaf: str
    detail: str


@dataclasses.dataclass
class SanitizerReport:
    findings: List[Finding] = dataclasses.field(default_factory=list)
    checks_run: List[str] = dataclasses.field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.findings

    def add(self, check: str, leaf: str, detail: str) -> None:
        self.findings.append(Finding(check, leaf, detail))

    def merge(self, other: "SanitizerReport") -> "SanitizerReport":
        self.findings.extend(other.findings)
        self.checks_run.extend(other.checks_run)
        return self

    def summary(self) -> str:
        if self.ok:
            return f"sanitizer OK ({', '.join(self.checks_run)})"
        lines = [f"sanitizer: {len(self.findings)} finding(s):"]
        for f in self.findings:
            lines.append(f"  [{f.check}] {f.leaf}: {f.detail}")
        return "\n".join(lines)

    def raise_if_failed(self) -> None:
        if not self.ok:
            raise AssertionError(self.summary())


def _leaf_paths(tree: Any) -> List[tuple]:
    leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(path), leaf) for path, leaf in leaves]


def _to_host(x: Any) -> Optional[np.ndarray]:
    if isinstance(x, (jax.Array, np.ndarray)):
        return np.asarray(x)
    if isinstance(x, (int, float, bool, complex)):
        return np.asarray(x)
    return None


def _bits_equal(a: np.ndarray, b: np.ndarray) -> bool:
    if a.shape != b.shape or a.dtype != b.dtype:
        return False
    # bit-compare, not value-compare: NaN != NaN under ==, but a
    # deterministic program must reproduce the same NaN payloads too
    if a.dtype.kind in "fc":
        a = np.ascontiguousarray(a).reshape(-1).view(np.uint8)
        b = np.ascontiguousarray(b).reshape(-1).view(np.uint8)
    return bool(np.array_equal(a, b))


def check_determinism(fn: Callable, args: Sequence[Any], *,
                      repeats: int = 3,
                      strict: bool = False) -> SanitizerReport:
    """Run ``fn(*args)`` ``repeats`` times and bit-compare every output
    leaf across runs. A jitted fn re-executes the same executable; a
    mismatch means a nondeterministic lowering (reduction-order races)
    or hidden state (an impure closure, a mutated input buffer).
    """
    rep = SanitizerReport(checks_run=["determinism"])
    baseline = None
    for i in range(repeats):
        out = jax.tree_util.tree_map(_to_host, fn(*args))
        flat = _leaf_paths(out)
        if baseline is None:
            baseline = flat
            continue
        if len(flat) != len(baseline):
            rep.add("determinism", "<structure>",
                    f"run {i} returned {len(flat)} leaves vs "
                    f"{len(baseline)} in run 0")
            break
        for (path, ref), (_, got) in zip(baseline, flat):
            if ref is None or got is None:
                continue
            if not _bits_equal(ref, got):
                where = ""
                if ref.shape == got.shape and ref.dtype == got.dtype:
                    n = int(np.sum(ref != got))
                    where = f" ({n}/{ref.size} elements differ)"
                rep.add("determinism", path,
                        f"run {i} differs from run 0{where}")
    if strict:
        rep.raise_if_failed()
    return rep


def check_purity(fn: Callable, args: Sequence[Any], *,
                 strict: bool = False) -> SanitizerReport:
    """Snapshot every input leaf, call ``fn(*args)``, and verify the
    inputs are bit-identical afterwards. Catches in-place mutation of
    host buffers (numpy views handed to a C extension, ctypes writes)
    and deleted/donated device buffers being left behind in a pytree
    the caller will reuse.
    """
    rep = SanitizerReport(checks_run=["purity"])
    before = [(p, None if l is None else l.copy())
              for p, l in ((p, _to_host(l)) for p, l in _leaf_paths(args))]
    fn(*args)
    after = _leaf_paths(args)
    for (path, ref), (_, leaf) in zip(before, after):
        if ref is None:
            continue
        if isinstance(leaf, jax.Array) and leaf.is_deleted():
            rep.add("purity", path,
                    "input buffer was deleted (donated?) during the call "
                    "but remains reachable from the caller's arguments")
            continue
        got = _to_host(leaf)
        if got is not None and not _bits_equal(ref, got):
            rep.add("purity", path, "input buffer mutated in place")
    if strict:
        rep.raise_if_failed()
    return rep


def check_finite(tree: Any, *, name: str = "tree",
                 strict: bool = False) -> SanitizerReport:
    """Walk a pytree for NaN/Inf in floating leaves."""
    rep = SanitizerReport(checks_run=["finite"])
    for path, leaf in _leaf_paths(tree):
        a = _to_host(leaf)
        if a is None or a.dtype.kind not in "fc":
            continue
        bad = ~np.isfinite(a.astype(np.float32))
        if bad.any():
            rep.add("finite", f"{name}{path}",
                    f"{int(bad.sum())}/{a.size} non-finite values")
    if strict:
        rep.raise_if_failed()
    return rep


# trace-time kernel-variant knobs probed by check_variant_parity. Each
# dict is an env override; the kernel reads them inside `_variant()`
# (ops/dequant_pallas.py:47) so they are part of the jit cache key — a
# fresh setting compiles a fresh executable, no cache flush needed.
# Each entry is (overrides, bit_exact): variants documented
# bit-identical to the base decode get a hard bit-compare; QFA_KSPLIT
# chunks the f32 dot accumulation (summation order may shift low bits)
# and QFA_COMBINE_PLANES reorders plane summation by design, so those
# get the tolerance compare instead.
VARIANT_KNOBS: List[tuple] = [
    ({"QFA_F32_SMALL_M": "32"}, True),
    ({"QFA_MAGIC_SMALL_M": "32"}, True),
    ({"QFA_F32_SMALL_M": "32", "QFA_MAGIC_SMALL_M": "32"}, True),
    ({"QFA_KSPLIT": "2"}, False),
]


def check_variant_parity(qt, x, *, knobs: Optional[List[Dict[str, str]]]
                         = None, strict: bool = False) -> SanitizerReport:
    """Decode ``x @ qt.T`` through every bit-exact kernel-variant knob
    and bit-compare against the base-knob run of the same path; also
    tolerance-compare the base run against the independent XLA dense
    decode (`ops/dequant_xla.py:143`). A bit mismatch between variants
    is a miscompile (the Mosaic-legalization class of bug — see
    docs/BYTECUT.md sw2/sw4), not a tolerance issue.
    """
    from ..ops.dequant_xla import decode_weights
    from ..ops.quant_matmul import quant_matmul

    rep = SanitizerReport(checks_run=["variant_parity"])
    knobs = knobs if knobs is not None else VARIANT_KNOBS
    saved: Dict[str, Optional[str]] = {}
    all_keys = sorted({k for kn, _ in knobs for k in kn})
    for k in all_keys:
        saved[k] = os.environ.get(k)
    try:
        for k in all_keys:
            os.environ.pop(k, None)
        base = np.asarray(quant_matmul(x, qt))

        # independent-path cross-check: dense XLA decode, bf16-rounding
        # tolerance (the two paths use different dot orders)
        W = decode_weights(qt, dtype=x.dtype)
        dense = np.asarray(jax.lax.dot_general(
            x, W, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jax.numpy.float32).astype(x.dtype))
        scale = float(np.abs(dense.astype(np.float32)).max()) or 1.0
        err = float(np.abs(base.astype(np.float32)
                           - dense.astype(np.float32)).max())
        if err > 0.05 * scale + 1e-3:
            rep.add("variant_parity", "base-vs-xla",
                    f"max |diff| {err:.3e} (scale {scale:.3e}) between "
                    "fused path and XLA dense decode")

        for kn, bit_exact in knobs:
            for k in all_keys:
                os.environ.pop(k, None)
            os.environ.update(kn)
            got = np.asarray(quant_matmul(x, qt))
            tag = ",".join(f"{k}={v}" for k, v in kn.items())
            diff = float(np.abs(got.astype(np.float32)
                                - base.astype(np.float32)).max())
            if bit_exact and not _bits_equal(got, base):
                rep.add("variant_parity", tag,
                        f"max |diff| {diff:.3e} vs base knobs "
                        "(documented bit-exact)")
            elif not bit_exact and diff > 0.05 * scale + 1e-3:
                rep.add("variant_parity", tag,
                        f"max |diff| {diff:.3e} (scale {scale:.3e}) vs "
                        "base knobs")
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    if strict:
        rep.raise_if_failed()
    return rep


def sanitize_decode_step(cfg, params, *, cache_len: int = 32,
                         repeats: int = 3,
                         strict: bool = False) -> SanitizerReport:
    """One-call sanitizer over a model's jitted single-token decode
    step: determinism + purity + output finiteness.
    """
    import jax.numpy as jnp

    from ..models import llama as M
    from ..runtime.generate import init_kv_caches

    caches = init_kv_caches(cfg, 1, cache_len, dtype=jnp.float32)
    ids = jnp.asarray([[1]])
    pos = jnp.asarray([[0]])

    @jax.jit
    def step(params, caches, ids, pos):
        return M.model_apply(cfg, params, ids, positions=pos,
                             kv_caches=caches, cache_position=0)

    args = (params, caches, ids, pos)
    rep = check_determinism(step, args, repeats=repeats)
    rep.merge(check_purity(step, args))
    logits, _ = step(*args)
    rep.merge(check_finite(logits, name="logits"))
    if strict:
        rep.raise_if_failed()
    return rep
