"""Packed (space-to-depth trunk) execution for low-channel high-res layers.

Why: on TPU every tensor tiles its minor dim onto 128 lanes. The >=512px
segments of StyleGAN2 run at C<=64 (teacher 1024px trunk: C=32; the pruned
student: C~10), so every conv, gradient and elementwise op pads 2-13x on
lanes. A steady-state 1024px trace (round 2) measured 946 ms/iter with 43%
in layout copies and 38% in conv fusions over C<=32 tensors at ~100 GB/s
effective — the chip idles on padding, not work.

The fix is the classic TPU rewrite done EXACTLY: keep the high-res trunk in
packed layout X[b, i, j, (qy, qx, c)] = x[b, 2i+qy, 2j+qx, c] (2x2 pixel
phases folded into channels, channel-minor order phase-major), and run every
op of the trunk on the packed tensors:

  * a kxk stride-s conv (with an optional preceding FIR blur folded in)
    becomes ONE dense packed conv with statically-gathered weights
    (pack_conv_weight): 4x the MAC count on 4x-denser lanes — net win
    wherever the unpacked op was layout/bandwidth-bound;
  * a transposed s2 conv (with an optional following FIR blur) becomes one
    packed lhs-dilated conv (pack_convT_weight);
  * upfirdn up=2 (the to_rgb skip upsample) is the convT case with an
    identity spatial kernel;
  * bias / activation / noise broadcast map channelwise (tile by 4 phases).

Weight packing happens at trace time from the UNCHANGED torch-mirror params
(tiny gathers over kxk kernels — the param pytree invariant is untouched).
Parity: bit-level math identity per tap (same products, conv-order sums);
verified against the unpacked path in tests/test_packed.py.

Reference for what these layers compute: /root/reference/model.py:106-142
(Blur/Upsample), 190-283 (ModulatedConv2d), 588-612 (ConvLayer/ResBlock).

Unlike the round-1 full-res space-to-depth experiment (rejected: 1.8-3x
slower at C>=128 shapes, docs/ARCHITECTURE.md), packing is applied ONLY
while C < 128, where measured wins are 3.3x fwd+bwd at the teacher's
1024px conv and the baseline is lane-padding-bound.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel order (qy, qx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def tile_channel_vector(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector [C] -> packed [4C] matching (phase, c) order."""
    return jnp.tile(v, 4)


def pack_noise(noise: jnp.ndarray, out_ch: int) -> jnp.ndarray:
    """Noise image [*, H, W, 1] -> [*, H/2, W/2, 4*out_ch] broadcastable
    against a packed feature map (each phase's value repeated across the
    phase's channel block).

    Negative result (round 2, measured end-to-end at 1024px batch 8): the
    relayout copies XLA:TPU inserts where this repeated tensor meets the
    packed conv's elementwise epilogue ({2,3,1,0} <-> {3,0,2,1}) CAN be
    eliminated by expressing the repeat as binary-kernel convs, whose
    outputs arrive conv-native — HLO copy bytes drop 1325 MB -> 184 MB
    (teacher width, fwd+bwd pair) — but every conv form is SLOWER end to
    end than just paying the copies: single fused [2,2,1,4C] stride-2 conv
    2.794 it/s (-3.6%), [2,2,1,4]+[1,1,4,4C] two-conv 2.732 (-5.7%),
    space_to_depth + [1,1,4,4C] repeat-conv 2.786 (-3.9%), vs 2.898 for
    this plain reshape+repeat, which XLA fuses into the consumer instead
    of materializing through the conv emitter. A 5-D phase-view add (no
    materialized repeat) was exactly neutral. So: the simple form stays;
    the ~9%-of-iter copy time at 1024px is load-bearing layout glue, not
    recoverable via noise-side rewrites."""
    n4 = space_to_depth(noise)  # [*, H/2, W/2, 4]
    return jnp.repeat(n4, out_ch, axis=-1)


def _axis_cells(L: int, sigma: int, P: int):
    """Static per-axis tap mapping for conv packing.

    The unpacked op (per axis) is y[t] = sum_d K[d] * x[sigma*t + d - P],
    d in [0, L). In packed coordinates (x-row 2a+q, y-row 2i+p) the same
    sum becomes a stride-sigma packed conv whose tap e satisfies
    d = 2e - 2Pp + q - sigma*p + P. Returns (Lp, Pp, m) where
    m[e, q, p] = original tap d, or -1 for a structurally-zero cell.
    """
    cells = {}
    for e in range(-4, 6):
        for q in (0, 1):
            for p in (0, 1):
                d = 2 * e + q - sigma * p + P
                if 0 <= d < L:
                    cells[(e, q, p)] = d
    es = [e for (e, _, _) in cells]
    e_min, e_max = min(es), max(es)
    Pp = -e_min
    Lp = e_max - e_min + 1
    m = -np.ones((Lp, 2, 2), np.int64)
    for (e, q, p), d in cells.items():
        m[e + Pp, q, p] = d
    return Lp, Pp, m


def _gather_packed(K: jnp.ndarray, my: np.ndarray, mx: np.ndarray):
    """Build Wp[ey, ex, (qy qx ci), (py px co)] from K[dy, dx, ci, co] using
    static index maps (my/mx hold -1 for zero cells; K is padded with one
    zero tap at index L so -1 maps there). The input-phase (q) dims follow
    my/mx's second dim: 2 for a packed input, 1 when the input is unpacked
    (the upsample family's trunk entry) — the reshape collapses whichever
    phases are present."""
    L_y, L_x, ci, co = K.shape
    Kp = jnp.pad(K, ((0, 1), (0, 1), (0, 0), (0, 0)))
    iy = np.where(my < 0, L_y, my)   # [Ey, q, 2] -> index into padded K
    ix = np.where(mx < 0, L_x, mx)
    zy = my < 0
    zx = mx < 0
    # broadcast: [Ey,1,qy,1,py,1] x [1,Ex,1,qx,1,px]
    gy = iy[:, None, :, None, :, None]
    gx = ix[None, :, None, :, None, :]
    zz = zy[:, None, :, None, :, None] | zx[None, :, None, :, None, :]
    W = Kp[gy, gx]                    # [Ey, Ex, qy, qx, py, px, ci, co]
    W = jnp.where(jnp.asarray(zz)[..., None, None], 0.0, W)
    # -> [Ey, Ex, (qy qx ci), (py px co)]
    W = W.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    Ey, Ex, qy, qx = W.shape[:4]
    return W.reshape(Ey, Ex, qy * qx * ci, 4 * co)


def compose_fir_2d(weight: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Spatial composition of a separable FIR with a conv weight: one
    kernel K (full 2-D convolution of the two tap grids) such that
    correlate(K, x) == correlate(W, blur(f, x)). Exact for SYMMETRIC taps
    (every FIR in the model family is 1,3,3,1 — asserted), where the
    blur's kernel flip is a no-op."""
    f = np.asarray(taps, np.float32)
    assert np.allclose(f, f[::-1]), "FIR composition assumes symmetric taps"
    k2 = jnp.asarray(np.outer(f, f))
    kh, kw, ci, co = weight.shape
    n = len(f)
    K = lax.conv_general_dilated(
        weight.transpose(2, 3, 0, 1).reshape(ci * co, 1, kh, kw),
        k2[None, None].astype(weight.dtype),
        (1, 1), ((n - 1, n - 1), (n - 1, n - 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    Lh, Lw = kh + n - 1, kw + n - 1
    return K.reshape(ci, co, Lh, Lw).transpose(2, 3, 0, 1)


def pack_conv_weight(weight: jnp.ndarray, *, stride: int = 1,
                     pad: tuple[int, int] | int = 0,
                     fir: np.ndarray | None = None,
                     fir_pad: tuple[int, int] | None = None):
    """Pack an HWIO conv weight for packed-layout execution.

    Returns (Wp, packed_pad) such that
      conv(Wp, X_packed, stride, packed_pad) == pack(conv(W, blur(x)))
    where blur is the optional separable FIR with fir_pad (applied first,
    as in the D downsample path, stylegan2.py:_conv_layer).
    pad is the CONV's own symmetric-or-pair padding.
    """
    if isinstance(pad, int):
        pad = (pad, pad)
    K = weight
    P0, P1 = pad
    if fir is not None:
        K = compose_fir_2d(weight, fir)
        q0, q1 = fir_pad
        P0, P1 = P0 + q0, P1 + q1
    L = K.shape[0]
    Lx = K.shape[1]
    Lp_y, Pp_y, my = _axis_cells(L, stride, P0)
    Lp_x, Pp_x, mx = _axis_cells(Lx, stride, P0)
    Wp = _gather_packed(K, my, mx)
    # right pad: enough for the last output's furthest tap
    return Wp, ((Pp_y, Lp_y), (Pp_x, Lp_x))


def packed_conv(x_packed: jnp.ndarray, weight: jnp.ndarray, *,
                stride: int = 1, pad: tuple[int, int] | int = 0,
                fir: np.ndarray | None = None,
                fir_pad: tuple[int, int] | None = None,
                out_size: int | None = None,
                precision=None) -> jnp.ndarray:
    """conv(blur(x)) on a packed tensor, returning the packed result.

    out_size: packed output spatial size (defaults to the unpacked op's
    output size / 2, computed from the shapes)."""
    if isinstance(pad, int):
        pad = (pad, pad)
    b, hp, wp, _ = x_packed.shape
    kh = weight.shape[0]
    Wp, ((Pp_y, Lp_y), (Pp_x, Lp_x)) = pack_conv_weight(
        weight, stride=stride, pad=pad, fir=fir, fir_pad=fir_pad)
    if out_size is None:
        Hb = 2 * hp  # unpacked input length
        if fir is not None:
            q0, q1 = fir_pad
            Hb = Hb + q0 + q1 - (len(np.asarray(fir)) - 1)
        T = (Hb + pad[0] + pad[1] - kh) // stride + 1
        assert T % 2 == 0, (T, "packed output needs even unpacked size")
        out_size = T // 2
    # packed right pad so that output rows i=0..out_size-1 are computable:
    # input index sigma*i + e - Pp_y must reach sigma*(out-1)+Lp-1-Pp
    need = stride * (out_size - 1) + Lp_y - 1 - Pp_y
    rpad_y = max(0, need - (hp - 1))
    need_x = stride * (out_size - 1) + Lp_x - 1 - Pp_x
    rpad_x = max(0, need_x - (wp - 1))
    out = lax.conv_general_dilated(
        x_packed, Wp.astype(x_packed.dtype), (stride, stride),
        ((Pp_y, rpad_y), (Pp_x, rpad_x)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    return out[:, :out_size, :out_size, :]


def _compose_up_kernel(weight: jnp.ndarray, fir, fir_pad, fir_gain):
    """Composite kernel + left pad for the upsample family.

    The unpacked op is z[u] = sum_t K2[t] x[(u + t - P2)/2] (odd terms
    vanish), covering both
      * StyleGAN2's up-styled-conv: lhs-dilated conv with flipped-W taps
        and (k-1,k-1) padding, then blur(fir, fir_pad, gain)
        (stylegan2.py:_modulated_conv2d up=True), where
        K2 = full_conv(fir*sqrt(gain), flip(W)), P2 = fir_pad[0] + (k-1);
      * upfirdn up=2 (to_rgb skip upsample): k=1 identity W,
        K2 = fir*sqrt(gain) per channel, P2 = fir_pad[0].
    """
    k = weight.shape[0]
    Wf = jnp.flip(weight, (0, 1))
    if fir is None:
        return Wf, k - 1
    f = np.asarray(fir, np.float32) * np.float32(np.sqrt(fir_gain))
    K2 = compose_fir_2d(Wf, f)
    return K2, fir_pad[0] + (k - 1)


def _axis_cells_up(L: int, P2: int, packed_in: bool):
    """Tap maps for the upsample family (output grid is 2x the input grid).

    packed_in: out[i] = sum_v Wp[v] x_dil[i + v - Pp] (lhs-dilation 2),
      nonzero at 2a = i + v - Pp; composite tap t = 2e + 2q - p + P2 with
      e = v - Pp. Returns m[e, q, p].
    unpacked in (trunk entry): plain s1 conv out[i] = sum_v Wp[v] x[i+v-Pp];
      t = 2e - p + P2. Returns m[e, 1, p] (input-phase dim collapsed).
    """
    cells = {}
    for e in range(-6, 8):
        for q in ((0, 1) if packed_in else (0,)):
            for p in (0, 1):
                t = 2 * e + (2 * q if packed_in else 0) - p + P2
                if 0 <= t < L:
                    cells[(e, q, p)] = t
    es = [e for (e, _, _) in cells]
    e_min, e_max = min(es), max(es)
    Pp = -e_min
    Lp = e_max - e_min + 1
    m = -np.ones((Lp, 2 if packed_in else 1, 2), np.int64)
    for (e, q, p), t in cells.items():
        m[e + Pp, q, p] = t
    return Lp, Pp, m


def packed_conv_up(x: jnp.ndarray, weight: jnp.ndarray, *,
                   fir: np.ndarray | None,
                   fir_pad: tuple[int, int] | None,
                   fir_gain: float = 1.0,
                   packed_in: bool = True,
                   out_size: int | None = None,
                   precision=None) -> jnp.ndarray:
    """blur(conv_transpose_s2(x, W)) -> PACKED result on the 2x grid.

    weight: HWIO (UNflipped; the torch conv_transpose2d semantics'
    spatial flip is applied internally). x is packed (packed_in=True,
    grid = res/2) or unpacked (trunk entry, grid = res).

    Negative result (round 5, measured end-to-end at 1024px batch 16):
    this lhs-dilated form is the one line of the production step below
    both rooflines (45 TF/s at 178 GB/s — docs/ROUND5_NOTES.md), and the
    obvious fix — regroup to a DENSE stride-1 conv on the input grid
    whose output channels carry (grid-phase, packed-phase) and follow
    with a (ay,ax) depth-to-space — was built, parity-verified, and
    REJECTED by measurement: the conv itself improves 45 -> 99 TF/s
    (44.6 ms vs 53.2), but the epilogue rearrange costs 25.8 ms of data
    formatting and un-fuses the downstream noise/bias/lrelu from the conv
    (+20 ms of now-separate elementwise passes) — net 1.166 it/s vs
    1.244, a 6.3%% regression. The dilated form keeps its consumers
    conv-native; XLA's fusion structure is worth more than the conv's
    tap efficiency here."""
    b, hg, wg, _ = x.shape
    K2, P2 = _compose_up_kernel(weight, fir, fir_pad, fir_gain)
    Lp_y, Pp_y, my = _axis_cells_up(K2.shape[0], P2, packed_in)
    Lp_x, Pp_x, mx = _axis_cells_up(K2.shape[1], P2, packed_in)
    Wp = _gather_packed(K2, my, mx)
    if out_size is None:
        out_size = 2 * hg if packed_in else hg
    if packed_in:
        need = out_size - 1 + Lp_y - 1 - Pp_y
        rpad_y = max(0, need - (2 * hg - 2))
        need_x = out_size - 1 + Lp_x - 1 - Pp_x
        rpad_x = max(0, need_x - (2 * wg - 2))
        out = lax.conv_general_dilated(
            x, Wp.astype(x.dtype), (1, 1),
            ((Pp_y, rpad_y), (Pp_x, rpad_x)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
    else:
        need = out_size - 1 + Lp_y - 1 - Pp_y
        rpad_y = max(0, need - (hg - 1))
        need_x = out_size - 1 + Lp_x - 1 - Pp_x
        rpad_x = max(0, need_x - (wg - 1))
        out = lax.conv_general_dilated(
            x, Wp.astype(x.dtype), (1, 1),
            ((Pp_y, rpad_y), (Pp_x, rpad_x)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
    return out[:, :out_size, :out_size, :]


def packed_upfirdn_up2(x_packed: jnp.ndarray, fir: np.ndarray,
                       pad: tuple[int, int], gain: float = 1.0,
                       precision=None) -> jnp.ndarray:
    """upfirdn2d(up=2) (the to_rgb skip upsample, ops.upsample_2d) on a
    packed tensor -> packed result on the 2x grid. The upsample-conv case
    with an identity 1x1 kernel (channels independent; the packed kernel
    is block-diagonal over channels)."""
    c = x_packed.shape[-1] // 4
    eye = jnp.eye(c, dtype=x_packed.dtype)[None, None]
    return packed_conv_up(x_packed, eye, fir=fir, fir_pad=pad,
                          fir_gain=gain, packed_in=True,
                          precision=precision)
