"""Multi-chip scaling: locus-sharded data parallelism over a device mesh.

The reference is single-threaded; its only scale-out story is manual
BED-splitting across processes (README.md:78-82).  Here the natural parallel
axis is the (locus × read-pool × haplotype) pair batch: pairs shard across a
1-D ``jax.sharding.Mesh`` ('locus' axis), each chip runs the pair-HMM scan on
its shard, and EM stutter-model sufficient statistics / per-sample posterior
blocks reduce over ICI with ``psum`` inside ``shard_map``.

The same step runs unchanged on 1 chip, an N-chip slice, or the CPU
``xla_force_host_platform_device_count`` simulation the tests use.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from longtr_tpu.ops.pairhmm import pairhmm_scan
from longtr_tpu.ops.posterior import LL_CLAMP
from longtr_tpu.utils.mathops import LOG_ONE_HALF

AXIS = "locus"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with their leading dim sharded over the mesh."""
    out = []
    for a in arrays:
        spec = P(AXIS, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec)))
    return tuple(out)


def pad_to_multiple(arrays, multiple: int, axis: int = 0):
    """Pad leading dim to a multiple (for even sharding). Returns (arrays, n)."""
    n = arrays[0].shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arrays, n
    out = []
    for a in arrays:
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, pad)
        out.append(np.pad(a, widths))
    return tuple(out), n


def sharded_pairhmm(mesh: Mesh, hap, hap_len, read, read_len, full_len, trans):
    """Pair-HMM over a locus-sharded pair batch. Scores return sharded."""
    fn = jax.jit(
        jax.shard_map(
            lambda *a: pairhmm_scan(*a),
            mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS), P(AXIS, None), P(AXIS), P(AXIS),
                      P()),
            out_specs=P(AXIS),
        ))
    return fn(hap, hap_len, read, read_len, full_len, trans)


def sharded_pairhmm_pallas(mesh: Mesh, hap, hap_len, read, read_len,
                           full_len, trans):
    """Locus-sharded Pallas kernel: each chip runs the transposed-VMEM
    kernel on its shard (real multi-chip path; the scan variant above is
    the CPU-mesh equivalent)."""
    from longtr_tpu.ops.pairhmm_pallas import _pallas_call_u8

    def local(h, hl, r, rl, fl, tr):
        return _pallas_call_u8(h, hl[None, :], r, rl[None, :],
                               fl[None, :], tr)

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS), P(AXIS, None), P(AXIS), P(AXIS),
                      P()),
            out_specs=P(AXIS),
        ))
    return fn(hap, hap_len, read, read_len, full_len, trans)


def pairhmm_batch_sharded(hap_codes, hap_lens, read_codes, read_lens,
                          full_hap_lens, params, mesh: Mesh | None = None):
    """Mesh-parallel drop-in for ``pairhmm_batch``: pads the pair batch to
    the device grid, shards it over the 'locus' axis and gathers scores.

    Uses the Pallas kernel per shard on TPU backends (per-shard batch
    padded to the 128-lane tile) and the scan elsewhere.  Bit-identical to
    the single-device paths element-wise.
    """
    mesh = mesh or make_mesh()
    ndev = mesh.devices.size
    from longtr_tpu.ops.pairhmm_pallas import pallas_fits
    use_pallas = (jax.default_backend() in ("tpu", "axon")
                  and pallas_fits(np.asarray(hap_codes).shape[1],
                                  np.asarray(read_codes).shape[1]))
    quantum = ndev * (128 if use_pallas else 8)
    hap = np.asarray(hap_codes, dtype=np.uint8)
    read = np.asarray(read_codes, dtype=np.uint8)
    B = hap.shape[0]
    Bpad = -(-B // quantum) * quantum
    if Bpad != B:
        hap = np.pad(hap, ((0, Bpad - B), (0, 0)))
        read = np.pad(read, ((0, Bpad - B), (0, 0)))
    pad1 = lambda a: np.pad(np.asarray(a, np.int32), (0, Bpad - B),
                            constant_values=1)
    hl, rl, fl = pad1(hap_lens), pad1(read_lens), pad1(full_hap_lens)
    trans = jnp.asarray(params.as_array())
    if use_pallas:
        out = sharded_pairhmm_pallas(mesh, hap, hl, read, rl, fl, trans)
    else:
        out = sharded_pairhmm(mesh, hap.astype(np.int32), hl,
                              read.astype(np.int32), rl, fl, trans)
    return np.asarray(out)[:B]


def _em_stats_local(LL, log_p1, log_p2, diff1, valid, n_categories):
    """Per-shard EM sufficient statistics with a psum reduction.

    LL: (R, A) read-vs-allele lls; diff1: (R, A) integer category ids in
    [0, n_categories); valid: (R,) mask.  Produces the category-binned
    expected counts the M step consumes, reduced across the mesh.
    This runs INSIDE shard_map.
    """
    LLc = jnp.clip(LL, LL_CLAMP, None)
    a = LLc + log_p1[:, None] + LOG_ONE_HALF
    b = LLc + log_p2[:, None] + LOG_ONE_HALF
    # per-read allele responsibilities (phase-marginal, flat prior)
    m = jnp.maximum(a, b)
    w = jnp.exp(m - jax.scipy.special.logsumexp(m, axis=1, keepdims=True))
    w = jnp.where(valid[:, None], w, 0.0)
    flat = jax.ops.segment_sum(w.reshape(-1), diff1.reshape(-1),
                               num_segments=n_categories)
    return jax.lax.psum(flat, AXIS)


def sharded_em_stats(mesh: Mesh, LL, log_p1, log_p2, diff_cats, valid,
                     n_categories: int):
    """All-reduced EM sufficient statistics over a read-sharded batch."""
    fn = jax.jit(
        jax.shard_map(
            partial(_em_stats_local, n_categories=n_categories),
            mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(AXIS, None), P(AXIS)),
            out_specs=P(),
        ),
        static_argnames=(),
    )
    return fn(LL, log_p1, log_p2, diff_cats, valid)


def training_step(mesh: Mesh, hap, hap_len, read, read_len, full_len, trans,
                  log_p1, log_p2, diff_cats, valid, n_categories: int):
    """One full 'training step': sharded pair-HMM + all-reduced EM stats.

    This is the step ``__graft_entry__.dryrun_multichip`` compiles over an
    N-device mesh: compute is locus-sharded, the EM statistics ride a psum.
    """
    def step(h, hl, r, rl, fl, tr, p1, p2, dc, v):
        scores = pairhmm_scan(h, hl, r, rl, fl, tr)
        LL = scores[:, None] + jnp.zeros((1, dc.shape[1]), scores.dtype)
        stats = _em_stats_local(LL, p1, p2, dc, v, n_categories)
        return scores, stats

    fn = jax.jit(
        jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS), P(AXIS, None), P(AXIS), P(AXIS),
                      P(), P(AXIS), P(AXIS), P(AXIS, None), P(AXIS)),
            out_specs=(P(AXIS), P()),
        ))
    return fn(hap, hap_len, read, read_len, full_len, trans, log_p1, log_p2,
              diff_cats, valid)
