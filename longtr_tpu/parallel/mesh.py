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
                           full_len, trans, chunked: bool = False):
    """Locus-sharded Pallas kernel: each chip runs the transposed-VMEM
    kernel on its shard (real multi-chip path; the scan variant above is
    the CPU-mesh equivalent).  ``chunked`` selects the j-chunked streaming
    variant for pairs beyond the resident kernel's VMEM envelope."""
    from longtr_tpu.ops.pairhmm_pallas import (JCHUNK, _pallas_call_chunked_u8,
                                               _pallas_call_u8)

    def local(h, hl, r, rl, fl, tr):
        if chunked:
            return _pallas_call_chunked_u8(h, hl[None, :], r, rl[None, :],
                                           fl[None, :], tr)
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
    from longtr_tpu.ops.pairhmm_pallas import (JCHUNK, chunked_fits,
                                               pallas_fits)
    N = np.asarray(hap_codes).shape[1]
    M = np.asarray(read_codes).shape[1]
    on_accel = jax.default_backend() in ("tpu", "axon")
    use_pallas = on_accel and pallas_fits(N, M)
    # multi-kb pairs beyond the resident envelope stream through the
    # j-chunked kernel per shard (the scan fallback serializes per-row
    # host syncs on axon — ~1000x slower)
    use_chunked = on_accel and not use_pallas and chunked_fits(N, M)
    quantum = ndev * (128 if (use_pallas or use_chunked) else 8)
    hap = np.asarray(hap_codes, dtype=np.uint8)
    read = np.asarray(read_codes, dtype=np.uint8)
    B = hap.shape[0]
    Bpad = -(-B // quantum) * quantum
    if Bpad != B:
        hap = np.pad(hap, ((0, Bpad - B), (0, 0)))
        read = np.pad(read, ((0, Bpad - B), (0, 0)))
    if use_chunked and M % JCHUNK:
        read = np.pad(read, ((0, 0), (0, JCHUNK - M % JCHUNK)))
    pad1 = lambda a: np.pad(np.asarray(a, np.int32), (0, Bpad - B),
                            constant_values=1)
    hl, rl, fl = pad1(hap_lens), pad1(read_lens), pad1(full_hap_lens)
    trans = jnp.asarray(params.as_array())
    if use_pallas or use_chunked:
        out = sharded_pairhmm_pallas(mesh, hap, hl, read, rl, fl, trans,
                                     chunked=use_chunked)
    else:
        out = sharded_pairhmm(mesh, hap.astype(np.int32), hl,
                              read.astype(np.int32), rl, fl, trans)
    return np.asarray(out)[:B]


def _em_estep_local(LL, log_p1, log_p2, sample_label, valid, cat, w_in,
                    w_out, prior, num_samples: int):
    """Full EM E-step for one read shard with cross-shard psum.

    The production E-step: diplotype posteriors under the
    population-frequency prior, read-phase posteriors, and the seven
    category-binned sufficient statistics the closed-form M step consumes
    (em_stutter_genotyper.cpp:63-168).

    LL (R, A): stutter-PMF read-vs-allele log-likelihoods; cat (R, A) int32
    in {0:in_eq, 1:in_up, 2:in_down, 3:out_up, 4:out_down}; w_in/w_out
    (R, A): |rep| / |eff| magnitudes for the diff-weighted sums.  Reads are
    sharded; the posterior accumulation and the final stats ride psums.
    """
    LLc = jnp.clip(LL, LL_CLAMP, None)
    a = LLc + log_p1[:, None] + LOG_ONE_HALF
    b = LLc + log_p2[:, None] + LOG_ONE_HALF
    T = jnp.logaddexp(a[:, :, None], b[:, None, :])
    T = jnp.where(valid[:, None, None], T, 0.0)
    Ppart = jax.ops.segment_sum(T, sample_label, num_segments=num_samples)
    P = jax.lax.psum(Ppart, AXIS) + prior[None]
    totals = jax.scipy.special.logsumexp(
        P.reshape(num_samples, -1), axis=1)
    Pn = P - totals[:, None, None]

    one = LOG_ONE_HALF + log_p1[:, None, None] + LLc[:, :, None]
    two = LOG_ONE_HALF + log_p2[:, None, None] + LLc[:, None, :]
    tot2 = jnp.logaddexp(one, two)
    Pr = Pn[sample_label]                        # (R, A, A)
    f0 = jax.scipy.special.logsumexp(Pr + (one - tot2), axis=2)   # (R, A)
    f1 = jax.scipy.special.logsumexp(Pr + (two - tot2), axis=1)   # (R, A)
    lin = jnp.exp(f0) + jnp.exp(f1)
    lin = jnp.where(valid[:, None], lin, 0.0)
    sums = jax.ops.segment_sum(lin.reshape(-1), cat.reshape(-1),
                               num_segments=5)
    din = jnp.sum(lin * w_in)
    dout = jnp.sum(lin * w_out)
    stats = jax.lax.psum(jnp.concatenate([sums, jnp.stack([din, dout])]),
                         AXIS)
    return Pn, totals, stats


def em_estep_sharded(mesh: Mesh, LL, log_p1, log_p2, sample_label, valid,
                     cat, w_in, w_out, prior, num_samples: int):
    """Read-sharded production E-step: posteriors replicated via psum,
    category stats all-reduced.  Returns (posteriors (S,A,A), totals (S,),
    stats (7,)) as numpy arrays."""
    ndev = mesh.devices.size
    arrays, R = pad_to_multiple((np.asarray(LL, np.float32),
                                 np.asarray(log_p1, np.float32),
                                 np.asarray(log_p2, np.float32),
                                 np.asarray(sample_label, np.int32),
                                 np.asarray(valid, bool),
                                 np.asarray(cat, np.int32),
                                 np.asarray(w_in, np.float32),
                                 np.asarray(w_out, np.float32)), ndev)
    LLp, p1p, p2p, labp, vp, catp, wip, wop = arrays
    if LLp.shape[0] != R:
        vp = vp.copy()
        vp[R:] = False
    sharded = shard_batch(mesh, LLp, p1p, p2p, labp, vp, catp, wip, wop)
    fn = jax.jit(
        jax.shard_map(
            partial(_em_estep_local, num_samples=num_samples),
            mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                      P(AXIS, None), P(AXIS, None), P(AXIS, None), P()),
            out_specs=(P(), P(), P()),
        ))
    Pn, totals, stats = fn(*sharded, jnp.asarray(prior, jnp.float32))
    return np.asarray(Pn), np.asarray(totals), np.asarray(stats)
