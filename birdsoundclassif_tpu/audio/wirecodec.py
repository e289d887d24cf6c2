"""Lossless PCM wire codec for the host->device audio transfer.

The TPU in this deployment can sit behind a narrow host link (the axon
tunnel moves ~18-46 MB/s; even PCIe hosts are finite), and the end-to-end
inference pipeline is transfer-bound: 600 s of PCM16 is 52.9 MB, a hard
floor on the per-file wall time no matter how fast the chip is (the
reference streams raw float tensors per batch and pays this many times
over, run_detection.py:53). This module shrinks the wire bytes losslessly:

  host:   d[n] = x[n] - x[n-1]  (int32 first differences, d[0] = x[0])
          pick the smallest k in {8, 10, 12, 13, 14, 16} whose two's-
          complement k-bit range holds all but <= OUTLIER_CAP deltas;
          clamp those outliers in the stored stream and ship the
          (position, residual) pairs in a side table rounded up to
          1024-entry buckets (empty for clean streams);
          bit-pack the k-bit deltas into plane-major uint8 planes.
  device: elementwise unpack (shifts/masks over whole planes — no
          gathers), scatter-add the outlier residuals back into the
          delta stream, then an exact int32 prefix sum reconstructs the
          samples bit-for-bit.

The prefix sum is a two-level blocked formulation: within-row cumsum via
one (block x block) lower-triangular f32 matmul on the MXU plus a small
row-offset cumsum. All partial sums are bounded by the int16 sample range
(a prefix of deltas telescopes to x[i] - x[start-1], |.| <= 65535 < 2^24),
so the f32 matmul is exact.

Quiet field recordings (the product's real input) compress to 8-12 bits
per sample; loud tonal content needs 13-14. k = 16 is a bit-exact
passthrough fallback, so the codec never loses and never errors.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SUPPORTED_BITS = (8, 10, 12, 13, 14, 16)
OUTLIER_CAP = 8192      # max outliers before k must grow (table itself is
                        # size-bucketed; a full table would be 64 KB on the wire)
_BLOCK = 512            # prefix-sum block width (one MXU tile-friendly matmul)


def _group_geometry(k: int) -> Tuple[int, int]:
    """samples-per-group g and bytes-per-group so g*k is a whole byte count."""
    g = 8 // np.gcd(k, 8)
    return int(g), int(g * k // 8)


@dataclasses.dataclass
class PackedAudio:
    """One file's packed PCM stream (everything that crosses the link)."""

    payload: np.ndarray        # (bytes_per_group, n_groups) uint8, plane-major
    outlier_pos: np.ndarray    # (n_tab,) int32, n_tab a multiple of 1024
    outlier_res: np.ndarray    # (n_tab,) int32; unused slots = 0 in both
    k: int                     # bits per stored delta
    n_samples: int             # real sample count (payload covers a padded count)

    @property
    def wire_bytes(self) -> int:
        return int(self.payload.size + self.outlier_pos.size * 8)


def choose_bits(deltas: np.ndarray) -> int:
    """Smallest supported k whose range holds all but <= OUTLIER_CAP deltas."""
    mags = np.abs(deltas)
    for k in SUPPORTED_BITS[:-1]:
        # two's complement k-bit range is [-2^(k-1), 2^(k-1) - 1]; use the
        # symmetric magnitude bound so the check is one comparison
        if np.count_nonzero(mags > (1 << (k - 1)) - 1) <= OUTLIER_CAP:
            return k
    return 16


def encode(samples: np.ndarray, k: Optional[int] = None) -> PackedAudio:
    """Pack int16 PCM into a k-bit delta stream (lossless; host side).

    Runs in the prefetcher thread, overlapped with device compute. Uses the
    one-pass C++ encoder (native/nbm_native.cpp nbm_wire_pack) when the
    native library is built; the numpy implementation below is the
    reference semantics and the fallback.
    """
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        # A silent cast would turn float PCM in [-1, 1] into near-silence
        # while claiming losslessness; callers must quantize explicitly.
        raise TypeError(
            f"encode() is lossless for int16 PCM only, got dtype {samples.dtype}; "
            "quantize explicitly (e.g. np.clip(np.round(x * 32768), -32768, 32767)"
            ".astype(np.int16)) before encoding"
        )
    x16 = np.ascontiguousarray(samples)
    if k is None or k in SUPPORTED_BITS:
        native = _native_encode(x16, k)
        if native is not None:
            return native
    x = x16.astype(np.int32)
    n = x.size
    d = np.empty(n, np.int32)
    if n:
        d[0] = x[0]
        np.subtract(x[1:], x[:-1], out=d[1:])
    if k is None:
        k = choose_bits(d)
    if k not in SUPPORTED_BITS:
        raise ValueError(f"unsupported bit width {k}")

    lo, hi = -(1 << (k - 1)), (1 << (k - 1)) - 1
    if k == 16:
        # int16 deltas span 17 bits; store them wrapped mod 2^16 — the
        # decoder's final int16 cast only needs the sample value mod 2^16
        stored = ((d + (1 << 15)) & 0xFFFF) - (1 << 15)
        res = np.zeros_like(d)
    else:
        stored = np.clip(d, lo, hi)
        res = d - stored
    pos = np.flatnonzero(res)
    if pos.size > OUTLIER_CAP:
        # caller picked k manually and it does not fit: fall back losslessly
        return encode(samples, 16)
    # size-bucketed side table (empty when the stream fits k cleanly), so
    # short or clean files pay no fixed overhead and the decode program
    # compiles for a handful of table shapes
    n_tab = -(-pos.size // 1024) * 1024 if pos.size else 0
    outlier_pos = np.zeros(n_tab, np.int32)
    outlier_res = np.zeros(n_tab, np.int32)
    outlier_pos[: pos.size] = pos
    outlier_res[: pos.size] = res[pos]

    g, bpg = _group_geometry(k)
    n_groups = -(-max(n, 1) // g)
    u = np.zeros(n_groups * g, np.uint32)
    u[:n] = (stored & ((1 << k) - 1)).astype(np.uint32)
    u = u.reshape(n_groups, g)
    payload = np.zeros((bpg, n_groups), np.uint8)
    for i in range(bpg):
        b0 = 8 * i
        acc = np.zeros(n_groups, np.uint32)
        for j in range(g):
            sh = b0 - j * k
            if sh >= k or sh <= -8:
                continue
            acc |= (u[:, j] >> sh) if sh >= 0 else (u[:, j] << -sh)
        payload[i] = (acc & 0xFF).astype(np.uint8)
    return PackedAudio(payload, outlier_pos, outlier_res, int(k), n)


def _native_encode(x16: np.ndarray, k: Optional[int]) -> Optional[PackedAudio]:
    """One-pass C++ encode; None when the lib is missing or k overflows."""
    try:
        from ..native import wav as native
    except Exception:
        return None
    if not native.wire_available():
        return None
    if k is None:
        analyzed = native.wire_analyze(x16, OUTLIER_CAP)
        if analyzed is None:
            return None
        k = analyzed[0]
    r = native.wire_pack(x16, int(k), OUTLIER_CAP)
    if r is None:  # forced k overflowed the table: wrap-mod-2^16 fallback
        r = native.wire_pack(x16, 16, OUTLIER_CAP)
        if r is None:
            return None
        k = 16
    payload, opos, ores, n_out = r
    n_tab = -(-n_out // 1024) * 1024 if n_out else 0
    return PackedAudio(
        payload, opos[:n_tab].copy(), ores[:n_tab].copy(), int(k), x16.size
    )


@partial(jax.jit, static_argnames=("k", "out_len", "offset"))
def decode_to_padded(
    payload: jnp.ndarray,      # (bytes_per_group, n_groups) uint8
    outlier_pos: jnp.ndarray,  # (n_tab,) int32, 1024-bucketed (may be empty)
    outlier_res: jnp.ndarray,  # (n_tab,) int32
    n_samples: jnp.ndarray,    # int32 scalar (traced: one program per shape)
    k: int,
    out_len: int,
    offset: int,
) -> jnp.ndarray:
    """Unpack + integrate on device into a zero-padded int16 buffer.

    Returns (out_len,) int16 with the decoded samples at
    [offset, offset + n_samples) — the exact layout `_chunk_spectrogram`
    consumes (centered STFT padding + block-bucket tail), so the decode is
    the only extra dispatch and nothing else in the front-end changes.
    """
    g, bpg = _group_geometry(k)
    n_groups = payload.shape[1]
    planes = payload.astype(jnp.int32)

    mask = (1 << k) - 1
    half = 1 << (k - 1)
    vals = []
    for j in range(g):
        lo_bit = j * k
        v = jnp.zeros((n_groups,), jnp.int32)
        for i in range(bpg):
            b0 = 8 * i
            if b0 + 8 <= lo_bit or b0 >= lo_bit + k:
                continue
            sh = b0 - lo_bit
            v = v | ((planes[i] << sh) if sh >= 0 else (planes[i] >> -sh))
        u = v & mask
        vals.append(u - ((u & half) << 1))  # sign-extend k-bit two's complement
    if g == 1:
        deltas = vals[0]
    else:
        deltas = jnp.stack(vals, axis=1).reshape(n_groups * g)

    # restore clamped outliers; unused slots are (pos=0, res=0) no-ops
    deltas = deltas.at[outlier_pos].add(outlier_res, mode="drop")

    x = _blocked_cumsum(deltas)
    idx = jnp.arange(x.shape[0], dtype=jnp.int32)
    x = jnp.where(idx < n_samples, x, 0).astype(jnp.int16)

    out = jnp.zeros((out_len,), jnp.int16)
    n_fit = min(int(x.shape[0]), out_len - offset)
    return jax.lax.dynamic_update_slice(out, x[:n_fit], (offset,))


def _blocked_cumsum(d: jnp.ndarray) -> jnp.ndarray:
    """Prefix sum, exact mod 2^32, via lower-triangular matmuls per block.

    TPU matmuls may run with bf16 operand mantissas (XLA default
    precision), so the deltas — up to 17 bits after outlier restore — are
    split into byte-sized hi/lo planes first: every operand is an integer
    < 2^9 (exact in bf16), every partial f32 accumulation is bounded by
    _BLOCK * 2^8 < 2^24 (exact in f32), for ANY subset accumulation order
    and ANY matmul precision mode. The two plane prefix sums are then
    recombined in int32. The row-offset accumulation may wrap int32 on
    long wrapped-delta (k=16) streams; fine, because the decoder only
    needs the result mod 2^16 (final int16 cast).
    """
    n = d.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    dp = jnp.pad(d, (0, n_pad - n)) if n_pad != n else d
    hi = dp >> 8                               # floor division: lo in [0, 256)
    lo = dp - (hi << 8)
    rows_hi = hi.reshape(n_pad // _BLOCK, _BLOCK).astype(jnp.float32)
    rows_lo = lo.reshape(n_pad // _BLOCK, _BLOCK).astype(jnp.float32)
    tri_t = jnp.triu(jnp.ones((_BLOCK, _BLOCK), jnp.float32))
    within = (rows_hi @ tri_t).astype(jnp.int32) * 256 + \
        (rows_lo @ tri_t).astype(jnp.int32)    # (m, B) row-wise prefix sums
    row_tot = within[:, -1]
    offsets = jnp.cumsum(row_tot) - row_tot    # exclusive prefix of row totals
    out = within + offsets[:, None]
    return out.reshape(n_pad)[:n]
