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
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
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
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] + w_specs

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
