"""Checkpoint / resume for long solver runs.

The reference never needed this (runs are seconds, SURVEY.md §5), but a
100-megapixel image at thousands of iterations does: the entire solver
state is one small pytree — (fdata, fista, prob-gradient/cos, prob_dist,
t) per the active body — so we snapshot it every K iterations and can
resume a killed run exactly where it stopped (the FISTA step size is
derived from the TOTAL planned iteration count, not the chunk, so
chunked execution is numerically identical to one uninterrupted scan).

Format: a .npz with the flattened carry leaves plus a pickled treedef
and a config fingerprint that refuses to resume mismatched runs.
"""

from __future__ import annotations

import dataclasses
import hashlib
import io
import pickle
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from jpeg2png_tpu.models.solver import (
    ChannelGeometry, _build_solver_impl, _pallas_default, active_tier,
)


def _fingerprint(geoms, weight, pweights, iterations, use_pallas) -> str:
    # the fingerprint includes the carry-format version AND the active
    # solver tier: each tier stores a differently-shaped prob carry
    # (coef-space devq / pixel-space pgrad / clamped cos), so a
    # checkpoint from another tier or an older format must be rejected
    # with the clear config-mismatch error, not silently reinterpreted
    # carry-v3: the two-lite canvas height pads to whole stripes (the
    # striped-lite gradient kernel's band geometry), so v2 two-lite
    # carries have different leaf shapes
    blob = repr(("carry-v3",
                 active_tier(geoms, use_pallas, tuple(pweights)),
                 geoms, weight, tuple(pweights), iterations,
                 use_pallas)).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def _to_host(x) -> np.ndarray:
    """Carry leaf -> host array, multi-host safe.

    In a multi-controller run the striped carry is sharded
    P(None, "y", None) across processes and is not fully addressable,
    so a plain np.asarray would raise; gather the global value instead
    (every process ends up with the full array — same pattern as
    distributed.gather_output)."""
    if isinstance(x, np.ndarray):
        return x
    if (isinstance(x, jax.Array)
            and not x.is_fully_addressable
            and not x.is_fully_replicated):
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def save_state(path, carry, iteration: int, fingerprint: str) -> None:
    """Snapshot a solver carry to `path` atomically.

    The write goes to an open temp-file handle in the target directory
    and os.replace()s over `path` — np.savez on a file object never
    appends '.npz' (so the os.path.exists checks on resume see the real
    file), and a kill mid-write can never leave a truncated snapshot
    that crashes np.load on resume."""
    import os
    import tempfile

    from jpeg2png_tpu.parallel.distributed import barrier, is_primary

    leaves, treedef = jax.tree.flatten(carry)
    # the gather is a collective — EVERY process runs it; only rank 0
    # then writes the file (shared-filesystem model, like every JAX
    # multihost checkpointing scheme; resume reads it on all ranks)
    arrays = {f"leaf_{i}": _to_host(x) for i, x in enumerate(leaves)}
    # np.savez cannot round-trip ml_dtypes bfloat16 (the two-lite /
    # mega-lite carries): store those bit-exactly as uint16 views plus
    # a mask, and view them back on load
    import ml_dtypes
    bf16_mask = np.zeros(len(leaves), dtype=bool)
    for i in range(len(leaves)):
        a = arrays[f"leaf_{i}"]
        if a.dtype == ml_dtypes.bfloat16:
            arrays[f"leaf_{i}"] = a.view(np.uint16)
            bf16_mask[i] = True
    arrays["_bf16_mask"] = bf16_mask
    if not is_primary():
        barrier("jpeg2png-ckpt-save")
        return
    buf = io.BytesIO()
    pickle.dump(treedef, buf)
    try:
        d = os.path.dirname(os.path.abspath(path))
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(
                    f,
                    _treedef=np.frombuffer(buf.getvalue(), dtype=np.uint8),
                    _iteration=np.int64(iteration),
                    _fingerprint=np.frombuffer(fingerprint.encode(),
                                               dtype=np.uint8),
                    **arrays,
                )
            os.replace(tmp, path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    finally:
        # reached on success AND on a rank-0 write failure: the other
        # ranks are already waiting at their barrier above — skipping
        # this one would strand them forever instead of failing fast
        barrier("jpeg2png-ckpt-save")


def load_state(path, fingerprint: str):
    """-> (carry, iteration). Raises ValueError on config mismatch."""
    with np.load(path) as z:
        saved_fp = bytes(z["_fingerprint"]).decode()
        if saved_fp != fingerprint:
            raise ValueError(
                "checkpoint was written by a different solve configuration "
                f"(saved {saved_fp}, current {fingerprint})")
        iteration = int(z["_iteration"])
        treedef = pickle.loads(bytes(z["_treedef"]))
        bf16_mask = z["_bf16_mask"] if "_bf16_mask" in z else None
        leaves = []
        i = 0
        while f"leaf_{i}" in z:
            a = z[f"leaf_{i}"]
            if bf16_mask is not None and bf16_mask[i]:
                import ml_dtypes

                a = a.view(ml_dtypes.bfloat16)
            leaves.append(a)
            i += 1
    return jax.tree.unflatten(treedef, leaves), iteration


@dataclasses.dataclass
class CheckpointedResult:
    fdata: np.ndarray
    metrics: np.ndarray
    resumed_from: int


def striped_fingerprint(geoms, n: int, use_pallas: bool,
                        weight: float, pweights, iterations: int) -> str:
    """Config fingerprint for striped snapshots.  Includes the stripe
    count (a carry for another mesh width has differently padded
    canvases) and the striped carry KIND — 'xla' / 'f32' / 'lite'
    (parallel/stripes.striped_carry_kind) — so a snapshot from one
    body is never reinterpreted by another."""
    from jpeg2png_tpu.parallel.stripes import striped_carry_kind

    blob = repr(("striped-carry-v2", int(n),
                 striped_carry_kind(geoms, n, bool(use_pallas),
                                    tuple(float(p) for p in pweights)),
                 geoms, float(weight), tuple(pweights),
                 int(iterations))).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def solve_striped_checkpointed(
    datas,
    quants,
    samps,
    weight: float,
    pweights,
    iterations: int,
    mesh,
    checkpoint_path: str,
    checkpoint_every: int = 100,
    simd_compat_logging: bool = True,
    use_pallas: Optional[bool] = None,
    resume: bool = True,
) -> CheckpointedResult:
    """Checkpoint/resume for STRIPED multi-device solves — the giant
    images sharded over a mesh are exactly the runs long enough to
    need it.  The striped carry (padded f/fista canvases, prob
    gradients, prob_dist, t) gathers to host .npz snapshots every
    `checkpoint_every` iterations; on resume the host arrays reshard
    onto the mesh through the solver's in_specs.  Chunked striped
    execution is numerically identical to one uninterrupted solve
    (the step size keys on the TOTAL count; tests/test_stripes.py
    proves chunk == one-shot)."""
    import os

    import jax.numpy as jnp

    from jpeg2png_tpu.parallel.stripes import (
        _build_striped, pallas_striped_lite_supported,
        pallas_striped_supported, stripes_supported,
    )

    geoms = tuple(
        ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
        for d, (sy, sx) in zip(datas, samps)
    )
    n = mesh.shape["y"]
    if not stripes_supported(geoms, n):
        raise ValueError(
            f"geometry {geoms} cannot be striped over {n} devices")
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and (pallas_striped_supported(geoms, n)
                           or pallas_striped_lite_supported(
                               geoms, n,
                               tuple(float(p) for p in pweights))))
    fp = striped_fingerprint(geoms, n, bool(use_pallas),
                             float(weight), tuple(pweights),
                             int(iterations))

    key = (geoms, float(weight), tuple(float(p) for p in pweights),
           int(iterations), bool(simd_compat_logging), mesh,
           bool(use_pallas))
    d_dev = [jnp.asarray(d) for d in datas]
    q_dev = [jnp.asarray(q) for q in quants]

    start = 0
    carry = None
    # only delete the snapshot on completion if THIS run validated it
    # (fingerprint-matched load) or wrote it — never a file belonging
    # to a different configuration the caller asked to ignore
    own_checkpoint = False
    if resume and os.path.exists(checkpoint_path):
        carry, start = load_state(checkpoint_path, fp)
        carry = jax.tree.map(jnp.asarray, carry)
        own_checkpoint = True

    all_metrics = []
    done = start
    fdata = None
    while done < iterations:
        nn = min(checkpoint_every, iterations - done)
        fdata, metrics, carry = _build_striped(*key, nn)(
            d_dev, q_dev, carry)
        all_metrics.append(np.asarray(metrics))
        done += nn
        if done < iterations:
            save_state(checkpoint_path, carry, done, fp)
            own_checkpoint = True

    from jpeg2png_tpu.parallel.distributed import barrier, is_primary
    if own_checkpoint:
        try:
            if is_primary() and os.path.exists(checkpoint_path):
                os.remove(checkpoint_path)
        finally:
            # always reach the barrier, even if rank-0's remove raises
            barrier("jpeg2png-ckpt-done")

    return CheckpointedResult(
        fdata=_to_host(fdata),   # striped: cross-process sharded
        metrics=(np.concatenate(all_metrics)
                 if all_metrics else np.zeros((0, 4), np.float32)),
        resumed_from=start,
    )


def solve_checkpointed(
    datas: Sequence[np.ndarray],
    quants: Sequence[np.ndarray],
    samps: Sequence[Tuple[int, int]],
    weight: float,
    pweights: Sequence[float],
    iterations: int,
    checkpoint_path: str,
    checkpoint_every: int = 100,
    simd_compat_logging: bool = True,
    use_pallas: Optional[bool] = None,
    resume: bool = True,
) -> CheckpointedResult:
    """solve_joint with periodic state snapshots and resume-on-restart."""
    import os

    geoms = tuple(
        ChannelGeometry(d.shape[0], d.shape[1], sy, sx)
        for d, (sy, sx) in zip(datas, samps)
    )
    if use_pallas is None:
        use_pallas = _pallas_default(geoms)
    impl = _build_solver_impl(
        geoms, float(weight), tuple(float(p) for p in pweights),
        int(iterations), bool(simd_compat_logging), "float32",
        bool(use_pallas),
    )
    fp = _fingerprint(geoms, float(weight), pweights, int(iterations),
                      bool(use_pallas))

    import jax.numpy as jnp
    d_dev = [jnp.asarray(d) for d in datas]
    q_dev = [jnp.asarray(q) for q in quants]

    start = 0
    carry = None
    own_checkpoint = False
    if resume and os.path.exists(checkpoint_path):
        carry, start = load_state(checkpoint_path, fp)
        carry = jax.tree.map(jnp.asarray, carry)
        own_checkpoint = True

    init_fn = jax.jit(lambda d, q: impl(d, q, None, 0)[2])
    if carry is None:
        carry = init_fn(d_dev, q_dev)

    all_metrics = []
    done = start
    fdata = None
    while done < iterations:
        chunk = min(checkpoint_every, iterations - done)
        step_fn = jax.jit(
            lambda d, q, c, n=chunk: impl(d, q, c, n))
        fdata, metrics, carry = step_fn(d_dev, q_dev, carry)
        all_metrics.append(np.asarray(metrics))
        done += chunk
        if done < iterations:
            save_state(checkpoint_path, carry, done, fp)
            own_checkpoint = True

    # completed: remove the snapshot so a rerun starts fresh — but only
    # one this run wrote or fingerprint-validated (resume=False must
    # not delete a stranger's file); rank 0 owns the file
    from jpeg2png_tpu.parallel.distributed import barrier, is_primary
    if own_checkpoint:
        try:
            if is_primary() and os.path.exists(checkpoint_path):
                os.remove(checkpoint_path)
        finally:
            # always reach the barrier, even if rank-0's remove raises
            barrier("jpeg2png-ckpt-done")

    return CheckpointedResult(
        fdata=np.asarray(fdata),
        metrics=(np.concatenate(all_metrics)
                 if all_metrics else np.zeros((0, 4), np.float32)),
        resumed_from=start,
    )
