"""Fused HiFi-GAN MRF stage as a Pallas TPU kernel.

The vocoder's multi-receptive-field stacks are the serving bottleneck
(PERFORMANCE.md): at 32-128 channels x 65k-262k samples they are pure
HBM-bandwidth. XLA runs the 18 chained convs of one stage as 18 separate
HBM round trips (~36x the activation size in traffic); this kernel keeps
a time tile of the activation resident in VMEM and runs the ENTIRE stage
— 3 ResBlock1 chains (k in {3,7,11}, dilations (1,3,5), leaky-relu
sandwiches, residual adds) and the final mean — in one pass: HBM traffic
drops to ~2x the activation size.

Layout: (C, T) per sample — C on sublanes (32..256), T on lanes, tiled by
``t_tile``. Halo handling: the input is pre-padded by PAD zeros per side;
each grid step DMAs an overlapping window of ``t_tile + 2*PAD`` into VMEM.
Tap shifts are static lane slices (zero-filled at the window edge); the
contamination they introduce grows only with the stage's true receptive
field (<= 60 samples < PAD = 64), so the central ``t_tile`` written out is
exact. True sequence-edge semantics (XLA re-zero-pads EVERY conv) are
reproduced by masking positions outside [0, T) after every conv.

Matches matcha_tpu.models.hifigan.ResBlock1 / Generator MRF exactly;
reference torch semantics at matcha/hifigan/models.py:14-105,181-197.
"""

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 64  # >= stage receptive field (k=11, dils 1+3+5 and 3 plain convs: 60)


def _shift(a: jnp.ndarray, o: int) -> jnp.ndarray:
    """Shift (C, E) left by o lanes (static), zero-filling the edge."""
    if o == 0:
        return a
    C, E = a.shape
    z = jnp.zeros((C, abs(o)), a.dtype)
    if o > 0:
        return jnp.concatenate([a[:, o:], z], axis=1)
    return jnp.concatenate([z, a[:, :o]], axis=1)


def _leaky(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def _make_kernel(kernel_sizes: Tuple[int, ...], dilations, C: int, t_tile: int,
                 T_true: int, compute_dtype=jnp.float32):
    E = t_tile + 2 * PAD
    n_blocks = len(kernel_sizes)

    def conv(x, W, bias, d, k):
        """'same' conv, dilation d: one MXU matmul over concatenated
        shifted copies — (C, k*C) @ (k*C, E)."""
        c = (k - 1) // 2
        x_cat = jnp.concatenate([_shift(x, (t - c) * d) for t in range(k)], axis=0)
        W_cat = W.reshape(k * C, C).T.astype(compute_dtype)  # (C_out, k*C_in)
        y = jax.lax.dot_general(
            W_cat, x_cat.astype(compute_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y + bias[:, None]

    def kernel(*refs):
        # refs: x_hbm, then per block (W1, B1, W2, B2), out_ref, xbuf, sem
        x_hbm = refs[0]
        wrefs = refs[1 : 1 + 4 * n_blocks]
        out_ref = refs[1 + 4 * n_blocks]
        xbuf = refs[2 + 4 * n_blocks]
        sem = refs[3 + 4 * n_blocks]

        b = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(x_hbm.at[b, :, pl.ds(i * t_tile, E)], xbuf, sem)
        cp.start()
        cp.wait()

        # positions outside the true sequence are zero after EVERY conv
        # (XLA zero-pads each conv independently at sequence edges)
        col = jax.lax.broadcasted_iota(jnp.int32, (C, E), 1)
        gpos = i * t_tile + col - PAD
        valid = (gpos >= 0) & (gpos < T_true)

        x = jnp.where(valid, xbuf[...], 0.0)
        xs = jnp.zeros((C, E), jnp.float32)
        for blk, k in enumerate(kernel_sizes):
            W1 = wrefs[4 * blk][...]      # (n_dil, k, C_in, C_out)
            B1 = wrefs[4 * blk + 1][...]  # (n_dil, C_out)
            W2 = wrefs[4 * blk + 2][...]
            B2 = wrefs[4 * blk + 3][...]
            xb = x
            for j, d in enumerate(dilations[blk]):
                xt = _leaky(xb)
                xt = conv(xt, W1[j], B1[j], int(d), k)
                xt = jnp.where(valid, xt, 0.0)
                xt = _leaky(xt)
                xt = conv(xt, W2[j], B2[j], 1, k)
                xt = jnp.where(valid, xt, 0.0)
                xb = xt + xb
            xs = xs + xb
        out_ref[0] = (xs / n_blocks)[:, PAD : PAD + t_tile]

    return kernel


def pick_t_tile(C: int) -> int:
    """Lane tile by channel width, sized to keep the working set (incl.
    the k*C x E tap-concat) inside the ~16 MB scoped-VMEM budget."""
    return {32: 2048, 64: 2048, 128: 1024}.get(C, 512)


@functools.partial(
    jax.jit,
    static_argnames=("kernel_sizes", "dilations", "t_tile", "interpret", "compute_dtype"),
)
def fused_mrf_stage(
    x: jnp.ndarray,
    weights: Tuple[jnp.ndarray, ...],
    kernel_sizes: Tuple[int, ...] = (3, 7, 11),
    dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3,
    t_tile: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Run one full MRF stage (mean of the ResBlock1 chains) fused.

    Args:
        x: (B, C, T) f32 activations (channels-first for lane-major time).
        weights: flat tuple, per block: W1 (n_dil, k, C_in, C_out),
            B1 (n_dil, C_out), W2 (n_dil, k, C_in, C_out), B2 (n_dil, C_out)
            — flax conv kernel layout stacked over dilations.
        t_tile: lane tile (multiple of 128).

    Returns:
        (B, C, T) f32, bit-comparable to the XLA ResBlock1 path (up to
        reassociation-level float differences).
    """
    B, C, T = x.shape
    n_blocks = len(kernel_sizes)
    # Never tile wider than the (128-padded) sequence: pick_t_tile sizes
    # the tile for long-T throughput shapes, and at short T the excess
    # tile inflates the scratch + out blocks past the ~16 MB scoped-VMEM
    # budget once the C=128 stacked weights are resident (observed: C=128,
    # T=512 with t_tile=1024 overflows by 620K).
    t_tile = min(t_tile, -(-T // 128) * 128)
    nT = -(-T // t_tile)
    T_pad = nT * t_tile
    # zero pad: PAD halo each side + tail up to the tile grid
    x_p = jnp.pad(x, ((0, 0), (0, 0), (PAD, PAD + T_pad - T)))

    kernel = _make_kernel(tuple(kernel_sizes), tuple(tuple(d) for d in dilations),
                          C, t_tile, T, compute_dtype)
    # weights are small; give them whole-array blocks replicated per step
    w_specs = [
        pl.BlockSpec(w.shape, lambda b, i, _n=w.ndim: (0,) * _n) for w in weights
    ]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + w_specs

    out = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, C, t_tile), lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B, C, T_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, t_tile + 2 * PAD), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_p, *weights)
    return out[:, :, :T]


# ---------------------------------------------------------------------------
# Phase-packed variant for the narrow stages (C in {32, 64}).
#
# The plain kernel's conv-as-matmul has M = C_out rows; at C=32 a 32-row
# matmul fills at most 25% of the 128x128 MXU — the measured ~28 TFLOP/s
# geometry bound on the Generator's narrow tail (PERFORMANCE.md). This
# variant repacks time phases into sublanes: x_packed[(p, c), s] =
# x[c, P*s + p] with P = 128 // C, so every conv's output has M = P*C =
# 128 rows (full MXU fill). A tap at original-time offset delta feeds
# output phase p from packed row-group (p+delta) mod P lane-shifted by
# floor((p+delta)/P) — so the matmul's K side stacks the UNION of needed
# offsets O = {p + (tap-c0)*d}, and the pre-packed weight matrix
# W_pack[(p, c_out), (o_idx, c_in)] places each tap at its offset. K grows
# by |O|/k (= (k+P-1)/k for d=1 convs, up to P for d >= P), which is the
# FLOP price paid for the P-fold fill gain — net ~1.9x at C=32, ~1.4x at
# C=64 analytically (two thirds of the stage's convs are dilation-1).
#
# MEASURED RESULT (round 3, scripts/profile_vocoder_stages.py, honest
# in-graph prefix deltas at B=8): NEUTRAL — phase 20.9/21.0 ms vs plain
# 18.3/19.1 ms at C=64/32. The analytic fill gain is real on the MXU,
# but building each conv's K-side operand costs |O| sublane-group
# extracts + lane shifts + a (|O|*C, E) concatenate in VMEM — 2.5-4x the
# plain kernel's VPU copy traffic — which cancels it. Kept (tested,
# exact) as the recorded experiment; `plain` stays the default. The
# narrow-stage fill bound (~28 TFLOP/s at C=32) stands as the price of
# HiFi-GAN's architecture on a 128x128 systolic array.
# ---------------------------------------------------------------------------


def _phase_offsets(k: int, d: int, P: int) -> Tuple[int, ...]:
    """Sorted union of packed-lane offsets needed by a (k, d) conv at P."""
    c0 = (k - 1) // 2
    return tuple(sorted({p + (t - c0) * d for p in range(P) for t in range(k)}))


def _phase_pad(kernel_sizes, dilations, P: int) -> int:
    """Packed-lane halo needed by the worst ResBlock chain: each conv's
    tap shifts reach ceil(c0*d/P) lanes each side, and the per-conv
    round-ups ACCUMULATE along the chain (conv1 dilated + conv2 d=1 per
    dilation level) — e.g. the k=11/(1,3,5) chain needs 19 packed lanes
    at P=4 although its true receptive field is only 60/P=15. Rounded to
    a multiple of 64 so the DMA window t_tile + 2*PAD stays 128-lane
    aligned (Mosaic requires HBM lane slices aligned to the (8,128)
    tiling; t_tile itself is a multiple of 128)."""
    worst = 0
    for k, dils in zip(kernel_sizes, dilations):
        c0 = (k - 1) // 2
        budget = sum(-(-c0 * int(d) // P) + -(-c0 // P) for d in dils)
        worst = max(worst, budget)
    return -(-worst // 64) * 64


def _mrf_offsets(kernel_sizes, dilations, P: int):
    """Static offsets per (block, dil) for conv1 (dilated) and conv2 (d=1)."""
    offs = []
    for k, dils in zip(kernel_sizes, dilations):
        offs.append(tuple((_phase_offsets(k, int(d), P), _phase_offsets(k, 1, P))
                          for d in dils))
    return tuple(offs)


def _pack_conv_weights(W, bias, d: int, k: int, P: int):
    """(k, C_in, C_out) flax kernel -> (P*C_out, |O|*C_in) packed matmul
    weights + (P*C_out,) bias, placing tap t of output phase p at offset
    column-block index of o = p + (t-c0)*d. Within one output phase the
    taps map to distinct offsets, so the placements never collide.

    Built as ONE einsum against a constant 0/1 placement tensor (rather
    than P*k dynamic-update-slices) so that when the packing is traced —
    e.g. params passed as jit arguments in a serving graph — it costs a
    single tiny contraction per conv per call, not hundreds of scatter
    ops."""
    offsets = _phase_offsets(k, d, P)
    oi = {o: i for i, o in enumerate(offsets)}
    c0 = (k - 1) // 2
    C_in, C_out = W.shape[1], W.shape[2]
    M = np.zeros((k, P, len(offsets)), np.float32)
    for p in range(P):
        for t in range(k):
            M[t, p, oi[p + (t - c0) * d]] = 1.0
    # Wp[(p, o), (q, i)] = sum_t M[t, p, q] * W[t, i, o]
    Wp = jnp.einsum("tpq,tio->poqi", jnp.asarray(M, W.dtype), W)
    return Wp.reshape(P * C_out, len(offsets) * C_in), jnp.tile(bias, P)


def pack_mrf_weights_phase(weights: Tuple[jnp.ndarray, ...], kernel_sizes,
                           dilations, P: int):
    """Re-pack ``mrf_weights_from_params`` output for the phase kernel.

    Returns a flat tuple: per block, per dilation j:
    (W1p, b1p, W2p, b2p) with W1p packed at (k, d_j) and W2p at (k, 1).
    """
    out = []
    for blk, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        W1, B1, W2, B2 = weights[4 * blk : 4 * blk + 4]
        for j, d in enumerate(dils):
            w1p, b1p = _pack_conv_weights(W1[j], B1[j], int(d), k, P)
            w2p, b2p = _pack_conv_weights(W2[j], B2[j], 1, k, P)
            out += [w1p, b1p, w2p, b2p]
    return tuple(out)


def _make_phase_kernel(kernel_sizes, dilations, C: int, P: int, t_tile: int,
                       T_true: int):
    """t_tile counts PACKED lanes (P original samples each)."""
    PAD4 = _phase_pad(kernel_sizes, dilations, P)
    E = t_tile + 2 * PAD4
    n_blocks = len(kernel_sizes)
    offs = _mrf_offsets(kernel_sizes, dilations, P)
    n_dil = len(dilations[0])

    def conv(x, Wp, bp, offsets):
        pieces = []
        for o in offsets:
            p_, q = o % P, o // P  # python floor semantics for negatives
            pieces.append(_shift(x[p_ * C : (p_ + 1) * C, :], q))
        X = jnp.concatenate(pieces, axis=0)
        y = jax.lax.dot_general(
            Wp[...], X, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y + bp[...][:, None]

    def kernel(*refs):
        x_hbm = refs[0]
        wrefs = refs[1 : 1 + 4 * n_blocks * n_dil]
        out_ref = refs[1 + 4 * n_blocks * n_dil]
        xbuf = refs[2 + 4 * n_blocks * n_dil]
        sem = refs[3 + 4 * n_blocks * n_dil]

        b = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(x_hbm.at[b, :, pl.ds(i * t_tile, E)], xbuf, sem)
        cp.start()
        cp.wait()

        # original-time positions: gpos = P*(i*t_tile + col - PAD4) + p
        col = jax.lax.broadcasted_iota(jnp.int32, (P * C, E), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (P * C, E), 0)
        gpos = P * (i * t_tile + col - PAD4) + row // C
        valid = (gpos >= 0) & (gpos < T_true)

        x = jnp.where(valid, xbuf[...], 0.0)
        xs = jnp.zeros((P * C, E), jnp.float32)
        w = 0
        for blk in range(n_blocks):
            xb = x
            for j in range(n_dil):
                W1p, b1p, W2p, b2p = wrefs[w : w + 4]
                w += 4
                o1, o2 = offs[blk][j]
                xt = _leaky(xb)
                xt = conv(xt, W1p, b1p, o1)
                xt = jnp.where(valid, xt, 0.0)
                xt = _leaky(xt)
                xt = conv(xt, W2p, b2p, o2)
                xt = jnp.where(valid, xt, 0.0)
                xb = xt + xb
            xs = xs + xb
        out_ref[0] = (xs / n_blocks)[:, PAD4 : PAD4 + t_tile]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kernel_sizes", "dilations", "t_tile", "interpret"),
)
def fused_mrf_stage_phase(
    x: jnp.ndarray,
    weights: Tuple[jnp.ndarray, ...],
    kernel_sizes: Tuple[int, ...] = (3, 7, 11),
    dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3,
    t_tile: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Phase-packed fused MRF stage for narrow channels (C in {32, 64}).

    Args:
        x: (B, T, C) f32 activations — channels-LAST (saves the swapaxes
            relayout the plain kernel needs; the pack transpose below
            replaces it).
        weights: ``mrf_weights_from_params`` output (packing happens here,
            traced — a handful of small einsums on the stacked weights).
        t_tile: lane tile in PACKED samples (each = P true samples);
            None = auto (512 packed; ``pick_t_tile(C)`` on the P==1
            fallback, where packed lanes equal true lanes and an explicit
            value is forwarded unchanged).

    Returns:
        (B, T, C) f32, same semantics as the plain kernel / XLA path.
    """
    B, T, C = x.shape
    P = max(1, 128 // C)
    if P == 1:
        y = fused_mrf_stage(jnp.swapaxes(x, 1, 2), weights,
                            kernel_sizes=kernel_sizes, dilations=dilations,
                            t_tile=t_tile or pick_t_tile(C), interpret=interpret)
        return jnp.swapaxes(y, 1, 2)
    T4 = -(-T // P)
    # Same short-sequence clamp as fused_mrf_stage, in packed lanes.
    t_tile = min(t_tile or 512, -(-T4 // 128) * 128)
    packed = pack_mrf_weights_phase(weights, kernel_sizes, dilations, P)

    PAD4 = _phase_pad(kernel_sizes, dilations, P)
    T_p = T4 * P
    nT = -(-T4 // t_tile)
    T4_pad = nT * t_tile
    # pack: (B, T, C) -> (B, P*C, T4): x_packed[b, p*C+c, s] = x[b, P*s+p, c]
    x_p = jnp.pad(x, ((0, 0), (0, T_p - T), (0, 0)))
    x_p = x_p.reshape(B, T4, P, C).transpose(0, 2, 3, 1).reshape(B, P * C, T4)
    x_p = jnp.pad(x_p, ((0, 0), (0, 0), (PAD4, PAD4 + T4_pad - T4)))

    kernel = _make_phase_kernel(tuple(kernel_sizes),
                                tuple(tuple(d) for d in dilations),
                                C, P, t_tile, T)
    w_specs = [
        pl.BlockSpec(w.shape, lambda b, i, _n=w.ndim: (0,) * _n) for w in packed
    ]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + w_specs

    out = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, P * C, t_tile), lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B, P * C, T4_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((P * C, t_tile + 2 * PAD4), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_p, *packed)
    # unpack: (B, P*C, T4_pad) -> (B, T, C)
    out = out[:, :, :T4].reshape(B, P, C, T4).transpose(0, 3, 1, 2).reshape(B, T_p, C)
    return out[:, :T, :]


def mrf_weights_from_params(resblock_params: Sequence[dict], n_dil: int = 3):
    """Stack folded flax ResBlock1 params (convs1_i/convs2_i) into the
    kernel's per-block weight tuple."""
    flat = []
    for p in resblock_params:
        W1 = jnp.stack([p[f"convs1_{j}"]["conv"]["kernel"] for j in range(n_dil)])
        B1 = jnp.stack([p[f"convs1_{j}"]["conv"]["bias"] for j in range(n_dil)])
        W2 = jnp.stack([p[f"convs2_{j}"]["conv"]["kernel"] for j in range(n_dil)])
        B2 = jnp.stack([p[f"convs2_{j}"]["conv"]["bias"] for j in range(n_dil)])
        flat += [W1, B1, W2, B2]
    return tuple(flat)
