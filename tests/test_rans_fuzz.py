"""Adversarial bitstream fuzz of the rANS-4x8 codec pair (VERDICT r4 #8).

`test_io_fuzz.py` corrupts whole CRAM containers; this suite attacks the
codec itself: the native decoder (`native/longtr_native.cc`, ltr_rans_decode)
and the pure-Python decoder (`io/rans.py`) are fed the same malformed
frames — mutated valid streams, truncated states, pathological frequency
tables, random blobs — and must either cleanly error or agree byte-for-byte.
A native out-of-bounds read/write would crash the test process; a decoder
hang would trip the suite timeout; silent disagreement between the two
paths is the bug class this file exists to catch (production prefers the
native decoder and falls back to Python — io/rans.py:351-366).

Reference analog: htslib's rans codec is fuzzed by OSS-Fuzz upstream; a
from-scratch stack has to earn the same property itself.
"""

import numpy as np
import pytest

from longtr_tpu import native
from longtr_tpu.io import rans
from longtr_tpu.io.rans import TOTFREQ, rans_compress, rans_decompress


def _python_decode(data: bytes, out_sz: int):
    """Pure-Python decode of a framed rANS block (no native dispatch)."""
    order = data[0]
    if order == 0:
        return rans._decode_o0(data, 9, out_sz)
    if order == 1:
        return rans._decode_o1(data, 9, out_sz)
    raise ValueError(f"unsupported rANS order {order}")


def _try(fn, *args):
    """(ok, value) — malformed input may raise anything, never crash/hang."""
    try:
        v = fn(*args)
        return True, v
    except Exception:
        return False, None


def _check_frame(data: bytes):
    """Feed one frame to both decoders; assert the agreement contract."""
    if len(data) < 9:
        # no complete header: python path may IndexError cleanly; the
        # native decoder must REJECT (None) — any byte payload it invented
        # for a frame with no header would be garbage presented as data
        _try(_python_decode, data, 16)
        assert native.rans_decode(data, 16) is None, data
        return "short"
    out_sz = int.from_bytes(data[5:9], "little")
    # cap the claimed output size so a lying header can't allocate GBs or
    # turn the (linear-in-out_sz) decoders into a minutes-long loop
    out_sz = min(out_sz, 1 << 16)
    if out_sz == 0:
        return "empty"
    py_ok, py_out = _try(_python_decode, bytes(data), out_sz)
    nat_out = native.rans_decode(bytes(data), out_sz)
    if py_ok and nat_out is not None:
        assert py_out == nat_out, (
            "native and Python rANS decoders disagree on the same frame "
            f"(order={data[0]}, n={len(data)}, out_sz={out_sz})")
        return "agree"
    return "error"


@pytest.mark.parametrize("order", [0, 1])
def test_valid_roundtrip_and_agreement(order):
    rng = np.random.default_rng(7_000 + order)
    for trial in range(40):
        n = int(rng.integers(1, 3000))
        if trial % 3 == 0:
            raw = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        elif trial % 3 == 1:  # skewed alphabet (the CRAM-typical case)
            raw = bytes(rng.choice(np.frombuffer(b"ACGTN!~", np.uint8),
                                   size=n, p=[.3, .3, .2, .1, .05, .03,
                                              .02]).astype(np.uint8))
        else:  # constant run (degenerate single-symbol table)
            raw = bytes([int(rng.integers(0, 256))]) * n
        frame = rans_compress(raw, order=order)
        assert rans_decompress(frame) == raw
        out_sz = int.from_bytes(frame[5:9], "little")
        nat = native.rans_decode(frame, out_sz)
        if nat is not None:  # native lib present in this env
            assert nat == raw
        assert _python_decode(frame, out_sz) == raw


@pytest.mark.parametrize("order", [0, 1])
def test_mutated_streams(order):
    """Bit flips / truncations / splices of valid frames: clean error or
    byte-agreement, never a native crash or a hang."""
    rng = np.random.default_rng(8_000 + order)
    raw = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=2048)
                .astype(np.uint8))
    valid = bytearray(rans_compress(raw, order=order))
    outcomes = {"agree": 0, "error": 0, "short": 0, "empty": 0}
    for trial in range(300):
        trng = np.random.default_rng(9_000 * (order + 1) + trial)
        data = bytearray(valid)
        kind = trial % 4
        if kind == 0:  # truncate (kills final states / payload tail)
            data = data[: int(trng.integers(0, len(data)))]
        elif kind == 1:  # flip bytes anywhere (header, table, payload)
            for _ in range(int(trng.integers(1, 20))):
                i = int(trng.integers(0, len(data)))
                data[i] = int(trng.integers(0, 256))
        elif kind == 2:  # corrupt the frequency-table region specifically
            hi = min(len(data), 9 + 600)
            for _ in range(int(trng.integers(1, 30))):
                i = int(trng.integers(9, hi))
                data[i] = int(trng.integers(0, 256))
        else:  # lie about sizes in the frame header
            data[1:5] = int(trng.integers(0, 1 << 20)).to_bytes(4, "little")
            data[5:9] = int(trng.integers(0, 1 << 20)).to_bytes(4, "little")
        outcomes[_check_frame(bytes(data))] += 1
    # distribution varies by order/mutation mix; the invariant is that the
    # harness ran all trials without native crash, hang, or disagreement
    assert sum(outcomes.values()) == 300, outcomes


def test_pathological_frequency_tables():
    """Hand-built malformed order-0 tables: zero freqs, sums far above
    TOTFREQ, truncated run-length encodings, empty alphabets."""
    assert TOTFREQ == 4096  # framing below assumes the 4x8 normalization

    def frame(payload, order=0, out_sz=64):
        return (bytes([order]) + len(payload).to_bytes(4, "little")
                + out_sz.to_bytes(4, "little") + payload)

    cases = []
    # empty alphabet: table terminator immediately, then garbage states
    cases.append(frame(b"\x00" + b"\xff" * 16))
    # one symbol whose frequency overflows TOTFREQ (0x80 escape, huge val)
    cases.append(frame(b"A\x8f\xff\x00" + b"\x01" * 16))
    # run-length start byte with no run payload (truncated table)
    cases.append(frame(b"A"))
    # claims symbol range A..A then never terminates the table
    cases.append(frame(b"A\x10"))
    # valid-looking table but payload too short for 4 states
    v = rans_compress(b"ABAB" * 64, order=0)
    cases.append(v[:9] + v[9:len(v) // 2])
    # order byte outside {0, 1}
    cases.append(frame(b"\x00" * 32, order=7))
    # giant claimed out_sz with a tiny payload (capped by _check_frame)
    cases.append(frame(b"A\x10\x00" + b"\x01" * 8, out_sz=1 << 15))
    for i, c in enumerate(cases):
        _check_frame(c)  # must not crash, hang, or silently disagree


def test_random_blobs():
    """Fully random frames: overwhelmingly error, never crash or hang."""
    for trial in range(200):
        rng = np.random.default_rng(10_000 + trial)
        n = int(rng.integers(0, 2000))
        blob = bytearray(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        if n >= 9:
            blob[0] = trial % 2  # steer half the trials into a real order
        _check_frame(bytes(blob))
