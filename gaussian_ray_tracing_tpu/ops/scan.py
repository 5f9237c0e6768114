"""Fused multi-channel int32 prefix sums over the pair stream (Pallas).

The binning pipeline (ops/tiles.py) needs several O(P) inclusive prefix
sums per frame over the ~1M-slot pair stream: the owner-rank forward fill
and one value head-fill per carried per-pair column. XLA runs each as a
separate multi-pass cumsum over HBM; this kernel computes ALL channels in
ONE pass at HBM bandwidth, with every scan expressed as MXU matmuls:

  - the stream is viewed as rows of 128 lanes; the within-row prefix over
    lanes is x @ T with T the inclusive upper-triangular ones;
  - int32 exactness on the MXU: x splits into (x >> 16) and (x & 0xffff),
    each row-prefix is exact in f32 (|sum| < 2^24 for bs <= 256 rows),
    and (hi << 16) + lo reassembles the true wrapped int32;
  - the cross-row prefix is a second pair of hi/lo matmuls with a (bs, bs)
    triangle; the exclusive form is inclusive - self (no shifts/rolls);
  - the cross-block carry lives in VMEM scratch across the sequential grid.

Head fills remain exact under int32 wraparound: deltas are computed and
summed modulo 2^32, so any value column (including packed bitfields)
round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BS = 256  # rows per block: keeps every f32 row-prefix |sum| < 2^24 (exact)


def _tri_incl(n: int) -> jnp.ndarray:
    """(n, n) T with T[i, j] = 1 iff i <= j: y = x @ T is an inclusive
    prefix along the contracted axis."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.float32)


def _tri_incl_low(n: int) -> jnp.ndarray:
    """(n, n) L with L[i, j] = 1 iff j <= i: y = L @ x is an inclusive
    prefix DOWN the rows (no reshapes/transposes needed on (n, 1) data)."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.float32)


def _split_scan(x_i32: jnp.ndarray, tri: jnp.ndarray, left: bool = False) -> jnp.ndarray:
    """Exact int32 inclusive prefix of x via four bf16 MXU passes
    (byte-wise split; wraparound-correct). Scans along the LAST axis with
    y = x @ tri, or DOWN the rows with y = tri @ x when left=True.

    Why bytes, not 16-bit halves: on the real MXU a DEFAULT-precision f32
    matmul executes as ONE bf16 pass, so operands must be exactly
    bf16-representable. Bytes (0..255, and -128..127 for the sign chunk)
    fit bf16's 8 significand bits; prefix sums of <= 256*128 byte terms
    stay < 2^24, exact in the f32 accumulator. The reassembly shifts wrap
    mod 2^32, exactly the int32 semantics the head fills rely on."""
    f32 = jnp.float32
    chunks = [
        jax.lax.shift_right_arithmetic(x_i32, 24),
        jax.lax.shift_right_logical(x_i32, 16) & jnp.int32(0xFF),
        jax.lax.shift_right_logical(x_i32, 8) & jnp.int32(0xFF),
        x_i32 & jnp.int32(0xFF),
    ]
    mm = (lambda a: jnp.dot(tri, a, preferred_element_type=f32)) if left else (
        lambda a: jnp.dot(a, tri, preferred_element_type=f32)
    )
    out = jnp.zeros_like(x_i32)
    for k, ch in enumerate(chunks):
        s = mm(ch.astype(jnp.bfloat16).astype(f32)).astype(jnp.int32)
        out = out + jax.lax.shift_left(s, (3 - k) * 8)
    return out


def _scan_kernel(x_ref, o_ref, carry, *, C: int, bs: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    tri_l = _tri_incl(128)
    tri_low = _tri_incl_low(bs)
    for c in range(C):
        x = x_ref[c]  # (bs, 128) int32, stream order = row-major
        y = _split_scan(x, tri_l)  # within-row inclusive prefix
        t = y[:, 127:128]  # (bs, 1) row totals
        s = _split_scan(t, tri_low, left=True)  # (bs, 1) inclusive down rows
        excl = s - t  # rows before this one
        # the carry is stored LANE-REPLICATED as a (1, 128) row: Mosaic
        # cannot broadcast a (1, 1) across sublanes and lanes in one op
        cc = carry[c : c + 1, :]  # (1, 128) cross-block carry
        o_ref[c] = y + excl + cc  # sublane-only broadcast of cc
        carry[c : c + 1, :] = cc + jnp.broadcast_to(
            s[bs - 1 : bs, :], (1, 128)
        )  # lane-only broadcast of the block total


@functools.partial(jax.jit, static_argnames=("interpret",))
def multi_cumsum_i32(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Inclusive prefix sum of int32 (C, P) along axis 1, C <= 16.

    One fused HBM pass for all channels; exact under int32 wraparound."""
    C, P = x.shape
    if C > 16:
        raise ValueError(f"at most 16 channels, got {C}")
    blk = _BS * 128
    pad = (-P) % blk
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    nb = (P + pad) // blk
    xp = xp.reshape(C, nb * _BS, 128)
    out = pl.pallas_call(
        functools.partial(_scan_kernel, C=C, bs=_BS),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((C, _BS, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, _BS, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, nb * _BS, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32)],
        interpret=interpret,
    )(xp)
    return out.reshape(C, -1)[:, :P]


def multi_head_fill(
    first: jnp.ndarray,  # (N,) int32 head slot of each owner (nondecreasing)
    values: list[jnp.ndarray],  # C arrays (N,) int32 to broadcast per owner
    cap: int,
    use_kernel: bool | None = None,
) -> list[jnp.ndarray]:
    """Broadcast C per-owner int32 columns onto the stream in ONE pass.

    Semantics of ops/tiles._head_fill per channel (delta scatter + cumsum;
    zero-count owners telescope), with a single (N, C) row scatter and one
    fused multi-channel scan. use_kernel defaults to TPU-only (the XLA
    cumsum fallback is used elsewhere, incl. under vmap/interpret)."""
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    C = len(values)
    # C SEPARATE 1-D delta scatters: XLA's TPU scatter costs scale with
    # update WIDTH far worse than with update count (measured, PERF.md
    # round 3: (N,) scatter 0.83 ms, (N,3) rows 4.45, (N,5) 4.58 — five
    # 1-D scatters are 3.07). A (P, C) context GATHER was also tried and
    # is catastrophically slow for narrow C (19.2 ms at (P,4): narrow
    # tables tile to (8,128) so every row touches a full 512 B tile row).
    bufs = []
    for v in values:
        v = v.astype(jnp.int32)
        delta = v - jnp.concatenate([jnp.zeros((1,), jnp.int32), v[:-1]])
        bufs.append(jnp.zeros((cap + 1,), jnp.int32).at[first].add(delta)[:cap])
    stacked = jnp.stack(bufs, axis=0)  # (C, cap)
    if use_kernel:
        out = multi_cumsum_i32(stacked)
        return [out[c] for c in range(C)]
    out = jnp.cumsum(stacked, axis=1)
    return [out[c] for c in range(C)]
