"""Polyphase (space-to-depth-folded) stem convolution.

The DRN stem is a 7x7 stride-1 conv 3->16 at full input resolution
(drn.py:132-137).  On the MXU this is catastrophic: 3 input and 16 output
channels use ~12% of the 128-wide systolic array, and profiling shows the
stem alone costing ~9 ms of a 23 ms DRN-D-22 frame at 1024x2048.

Exact reformulation: with factor f, write output coordinates as
(f*i + a, f*j + b).  Then

    y[f*i+a, f*j+b, o] = sum_{m, dy, dx, c} x4[i+m, j+n, (dy,dx,c)]
                          * W7[f*m + dy + P - a, f*n + dx + P - b, c, o]

where x4 is the f x f space-to-depth of x and P is the original padding.
That is ONE dense conv with kernel (KH, KW) = ceil((K-1+f)/f + adjustments),
f^2*3 input channels and f^2*16 output channels, followed by depth-to-space.
At f=4: 48 -> 256 channels on a quarter-resolution grid — full MXU lanes.
FLOPs grow by the kernel zero-padding factor (~5x of a tiny op) but wall
clock drops by an order of magnitude.

Weights are rearranged exactly (zero-filled where f*m + dy + P - a falls
outside the 7x7 kernel); equality with the direct conv is tested to fp
tolerance in tests/test_polyphase.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def fold_conv_poly(
    w: np.ndarray, stride: int, pad: int, f_in: int, f_out: int
) -> tuple[np.ndarray, int, int]:
    """General polyphase fold: a (K, K, C, O) conv with ``stride`` and
    ``pad``, whose input lives on an ``f_in`` space-to-depth grid and whose
    output should live on an ``f_out`` grid, becomes a dense stride-1 conv
    with channels (f_in^2*C) -> (f_out^2*O).  Requires
    ``stride * f_out == f_in``.

    Derivation: y[f_out*i + a] = sum_p x[stride*(f_out*i + a) + p - pad] W[p]
    and the x index rewritten on the f_in grid as f_in*(i+m) + dy gives
    m = floor((stride*a + p - pad)/f_in), dy = (stride*a + p - pad) % f_in.

    Returns (w_poly (KH, KW, f_in^2*C, f_out^2*O), pad_lo, pad_hi).
    """
    K = w.shape[0]
    C, O = w.shape[2], w.shape[3]
    assert stride * f_out == f_in, (stride, f_out, f_in)
    lo = (0 - pad) // f_in
    hi = (stride * (f_out - 1) + K - 1 - pad) // f_in
    KH = hi - lo + 1
    wp = np.zeros((KH, KH, f_in * f_in * C, f_out * f_out * O), np.float32)
    for a in range(f_out):
        for b in range(f_out):
            for p in range(K):
                for q in range(K):
                    ia = stride * a + p - pad
                    ib = stride * b + q - pad
                    m, dy = ia // f_in, ia % f_in
                    n, dx = ib // f_in, ib % f_in
                    ci = (dy * f_in + dx) * C
                    co = (a * f_out + b) * O
                    wp[m - lo, n - lo, ci : ci + C, co : co + O] = w[p, q]
    return wp, -lo, hi


def fold_conv_poly_general(
    w: np.ndarray, stride: int, pad: int, f_in: int, f_out: int
) -> tuple[np.ndarray, int, int, int]:
    """Polyphase fold with a FOLDED-GRID STRIDE: valid whenever
    ``stride * f_out % f_in == 0`` (fold_conv_poly is the special case
    stride*f_out == f_in, folded stride 1).

    A (K, K, C, O) conv with ``stride``/``pad`` whose input lives on an
    ``f_in`` grid and whose output lives on an ``f_out`` grid becomes a
    stride-``sf`` conv with ``sf = stride*f_out//f_in``:

        out full index = stride*(f_out*I + a) + p - pad = f_in*M + dy
        =>  M = sf*I + (stride*a + p - pad - dy) / f_in   (when integral)

    Returns (w_poly (KH, KW, f_in^2*C, f_out^2*O), sf, pad_lo, pad_hi).
    """
    K = w.shape[0]
    C, O = w.shape[2], w.shape[3]
    assert (stride * f_out) % f_in == 0, (stride, f_out, f_in)
    sf = stride * f_out // f_in
    offs = [
        (stride * a + p - pad - dy)
        for a in range(f_out)
        for p in range(K)
        for dy in range(f_in)
        if (stride * a + p - pad - dy) % f_in == 0
    ]
    lo = min(offs) // f_in
    hi = max(offs) // f_in
    KH = hi - lo + 1
    wp = np.zeros((KH, KH, f_in * f_in * C, f_out * f_out * O), np.float32)
    for a in range(f_out):
        for b in range(f_out):
            for p in range(K):
                for q in range(K):
                    ia = stride * a + p - pad
                    ib = stride * b + q - pad
                    for dy in range(f_in):
                        if (ia - dy) % f_in:
                            continue
                        for dx in range(f_in):
                            if (ib - dx) % f_in:
                                continue
                            m = (ia - dy) // f_in
                            n = (ib - dx) // f_in
                            ci = (dy * f_in + dx) * C
                            co = (a * f_out + b) * O
                            wp[m - lo, n - lo, ci : ci + C, co : co + O] = w[p, q]
    return wp, sf, -lo, hi


def refold(x: jax.Array, f_from: int, f_to: int) -> jax.Array:
    """Move phase factors from channels to space: (n, h, w, f_from^2*c) on
    an f_from grid -> (n, h*r, w*r, f_to^2*c) on an f_to grid, r = f_from //
    f_to.  Channel order (dy, dx, c) is preserved on both sides.

    Row identity: f_from*i + dy = f_to*(r*i + u) + dy' with dy = f_to*u +
    dy' (u the high part), same for columns — so
    out[r*i+u, r*j+v, (dy', dx', c)] = x[i, j, (f_to*u+dy', f_to*v+dx', c)].
    Exactness tested in tests/test_polyphase.py.
    """
    n, h, w, ch = x.shape
    r = f_from // f_to
    assert f_to * r == f_from, (f_from, f_to)
    c = ch // (f_from * f_from)
    # split channels (dy, dx, c) -> (u, dy', v, dx', c)
    x = x.reshape(n, h, w, r, f_to, r, f_to, c)
    # (n, h, w, u, dy', v, dx', c) -> (n, h, u, w, v, dy', dx', c)
    x = x.transpose(0, 1, 3, 2, 5, 4, 6, 7)
    return x.reshape(n, h * r, w * r, f_to * f_to * c)


def fold_stem_weights(w7: np.ndarray, f: int = 4, pad: int = 3):
    """Rearrange a (K, K, C, O) stride-1 conv kernel into the polyphase
    kernel (KH, KW, f*f*C, f*f*O) plus the conv padding to use.

    Returns (w_poly, pad_lo, pad_hi).
    """
    K = w7.shape[0]
    C, O = w7.shape[2], w7.shape[3]
    # m ranges so that p = f*m + dy + pad - a stays within [0, K) for some
    # dy, a in [0, f): p_min when m minimal...
    m_lo = -((pad + f - 1) // f)  # floor((0 - (f-1) - pad)/f) inclusive
    m_lo = (0 - (f - 1) - pad) // f
    m_hi = (K - 1 + 0 - 0 - pad + f - 1) // f  # max over dy=0, a=f-1
    m_hi = (K - 1 - pad + (f - 1)) // f
    KH = m_hi - m_lo + 1
    w = np.zeros((KH, KH, f * f * C, f * f * O), dtype=np.float32)
    for a in range(f):
        for b in range(f):
            for m in range(m_lo, m_hi + 1):
                for n in range(m_lo, m_hi + 1):
                    for dy in range(f):
                        for dx in range(f):
                            p = f * m + dy + pad - a
                            q = f * n + dx + pad - b
                            if 0 <= p < K and 0 <= q < K:
                                ci = (dy * f + dx) * C
                                co = (a * f + b) * O
                                w[m - m_lo, n - m_lo, ci : ci + C, co : co + O] = w7[
                                    p, q
                                ]
    return w, -m_lo, m_hi


def space_to_depth(x: jax.Array, f: int) -> jax.Array:
    """Exact (n, h, w, c) -> (n, h/f, w/f, f*f*c), channel order (dy, dx, c).

    Fast path: the naive 6D transpose of a low-channel tensor is
    catastrophically slow on TPU (measured 2.0 ms for a 1024x2048x3 uint8
    frame — ~6 GB/s — because c=3 occupies 3 of 128 lanes).  When one
    (dx, c)-cell is a whole number of 4-byte words, the W-interleave is
    word-contiguous: bitcast rows to int32, transpose (h/f, f, w/f, words)
    -> (h/f, w/f, f, words), bitcast back — measured 1.1 ms for the same
    frame, bit-exact (tests/test_polyphase.py).
    """
    n, h, w, c = x.shape
    itemsize = x.dtype.itemsize
    cell_bytes = f * c * itemsize
    if cell_bytes % 4 == 0 and itemsize < 4:
        words = cell_bytes // 4
        group = 4 // itemsize  # elements per i32 word
        xi = jax.lax.bitcast_convert_type(
            x.reshape(n, h, (w * c) // group, group), jnp.int32)
        xi = xi.reshape(n, h // f, f, w // f, words)
        xi = xi.transpose(0, 1, 3, 2, 4).reshape(n, h // f, w // f, f * words)
        out = jax.lax.bitcast_convert_type(xi, x.dtype)
        return out.reshape(n, h // f, w // f, f * f * c)
    x = x.reshape(n, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // f, w // f, f * f * c)


def space_to_depth_flat(x: jax.Array, f: int, c: int = 3) -> jax.Array:
    """``space_to_depth`` from FLAT frame rows: (n, h, w*c) -> the same
    (n, h/f, w/f, f*f*c) output, bit-exact (tests/test_polyphase.py).

    Motivation (measured on v5e, 1024x2048x3 uint8): a (h, w, 3) device
    array puts c=3 in the minor (lane) dimension, so EVERY full-tensor op on
    it — even an elementwise add, or the copy of a loop carry — runs at
    ~3/128 lane occupancy (~0.8 ms/pass).  The identical bytes shaped
    (h, w*c) occupy all 128 lanes.  Video decoders produce exactly these
    bytes contiguously, so feeding frames flat costs the host nothing
    (a numpy reshape is a view) and removes the layout tax from the whole
    device program.
    """
    n, h, wc = x.shape
    assert wc % c == 0, (wc, c)
    w = wc // c
    itemsize = x.dtype.itemsize
    cell_bytes = f * c * itemsize
    if cell_bytes % 4 == 0 and itemsize < 4:
        words = cell_bytes // 4
        group = 4 // itemsize
        xi = jax.lax.bitcast_convert_type(
            x.reshape(n, h, wc // group, group), jnp.int32)
        xi = xi.reshape(n, h // f, f, w // f, words)
        xi = xi.transpose(0, 1, 3, 2, 4)
        out = jax.lax.bitcast_convert_type(xi, x.dtype)
        return out.reshape(n, h // f, w // f, f * f * c)
    x = x.reshape(n, h // f, f, w // f, f * c)
    return x.transpose(0, 1, 3, 2, 4).reshape(n, h // f, w // f, f * f * c)


def fold_input(x: jax.Array, f: int, c: int = 3) -> jax.Array:
    """Space-to-depth that accepts (n, h, w, c) frames or (n, h, w*c) flat
    frame rows (preferred on TPU; see space_to_depth_flat)."""
    if x.ndim == 3:
        return space_to_depth_flat(x, f, c)
    return space_to_depth(x, f)


def depth_to_space(x: jax.Array, f: int) -> jax.Array:
    n, h, w, c = x.shape
    o = c // (f * f)
    x = x.reshape(n, h, w, f, f, o)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * f, w * f, o)


class PolyphaseFrontend:
    """Polyphase execution of the DRN-D frontend (layers 0..2) entirely in
    space-to-depth domain — the three low-channel full/half-resolution convs
    that dominate wall clock otherwise.

    layer0 (7x7 s1 3->16, pad 3)  : f=4 -> f=4 grid, 48 -> 256 channels
    layer1 (3x3 s1 16->16, pad 1) : f=4 -> f=4 grid, 256 -> 256 channels
    layer2 (3x3 s2 16->32, pad 1) : f=4 -> f=2 grid, 256 -> 128 channels
    then one depth-to-space(2) emits the (H/2, W/2, 32) tensor layer3 expects.

    BN must already be folded into the conv biases (tpuseg.ops.fold_bn).
    Exactness vs the direct path is tested in tests/test_polyphase.py.
    """

    def __init__(self, params, names=("layer.0.0", "layer.1.0", "layer.2.0"),
                 f: int = 4, dtype=jnp.bfloat16,
                 normalize: tuple | None = None, int8_stem: bool = False):
        # f trades kernel-padding overcompute (grows with f) against MXU lane
        # occupancy (64 channels at f=2 vs 256 at f=4).  Measured on v5e at
        # 1024x2048: f=4 85.6 fps vs f=2 68.6 fps — lanes win.
        #
        # ``normalize=(mean, std)`` moves `(x/255 - mean)/std` AFTER the
        # space-to-depth: elementwise ops commute exactly with the
        # permutation, and normalizing a 3-lane full-res tensor costs ~1 ms
        # that the 48-lane quarter-res tensor does not (measured on v5e).
        # The caller then feeds RAW uint8-valued frames.
        self.f = f
        self.normalize = None
        if normalize is not None:
            mean, std = (np.asarray(v, np.float32) for v in normalize)
            self.normalize = (
                jnp.asarray(np.tile(mean, f * f)),
                jnp.asarray(np.tile(1.0 / std, f * f)),
            )
        specs = [  # (stride, pad, f_in, f_out)
            (1, 3, f, f),
            (1, 1, f, f),
            (2, 1, f, f // 2),
        ]
        self.convs = []
        for name, (stride, pad, fi, fo) in zip(names, specs):
            w = np.asarray(params[f"{name}.weight"], np.float32)
            bias = np.asarray(params[f"{name}.bias"], np.float32)
            wp, plo, phi = fold_conv_poly(w, stride, pad, fi, fo)
            bias_p = np.tile(bias, fo * fo)
            self.convs.append(
                (jnp.asarray(wp, dtype), jnp.asarray(bias_p, dtype), plo, phi)
            )
        self.out_f = specs[-1][3]
        # int8 stem convs (measured +12% on the frontend, bench_sparse
        # --frontend): per-output-channel weight scales; activation scales
        # are ANALYTIC for conv0 (its input is the normalized uint8 frame,
        # whose exact range follows from (mean, std)), and dynamic
        # per-frame absmax for the rest unless ``stem_x_scales`` is set
        # (calibrate_stem_scales) — static scales remove the reductions.
        self.int8_stem = bool(int8_stem)
        self.stem_x_scales: list | None = None
        if int8_stem:
            from tpuseg.ops.quant import quantize_weight

            self.q_convs = [
                (jnp.asarray(wq), jnp.asarray(ws))
                for wq, ws in (
                    quantize_weight(np.asarray(wp, np.float32))
                    for wp, _b, _lo, _hi in self.convs
                )
            ]
            if self.normalize is not None:
                mean, std = (np.asarray(v, np.float32) for v in normalize)
                bound = np.maximum(
                    np.abs((0.0 - mean) / std), np.abs((1.0 - mean) / std)
                ).max()
                self.conv0_x_scale = float(bound / 127.0)
            else:
                self.conv0_x_scale = None  # dynamic

    def _stem_convs(self, x: jax.Array) -> jax.Array:
        """The three folded stem convs; int8 when ``int8_stem`` is set."""
        dtype = self.convs[0][0].dtype
        if not self.int8_stem:
            for wp, bias, plo, phi in self.convs:
                x = jax.lax.conv_general_dilated(
                    x, wp, (1, 1), [(plo, phi), (plo, phi)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                x = jax.nn.relu(x + bias)
            return x
        for i, ((_wp, bias, plo, phi), (wq, ws)) in enumerate(
                zip(self.convs, self.q_convs)):
            if i == 0 and self.conv0_x_scale is not None:
                xs = jnp.float32(self.conv0_x_scale)
            elif self.stem_x_scales is not None:
                xs = jnp.float32(self.stem_x_scales[i])
            else:
                # per-frame dynamic scale (reduce HWC only) — frames stay
                # independent of their batch mates, as in ops.quant
                absmax = jnp.max(
                    jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3),
                    keepdims=True,
                )
                xs = jnp.maximum(absmax, 1e-8) / 127.0
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / xs), -127, 127
            ).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, wq, (1, 1), [(plo, phi), (plo, phi)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            x = jax.nn.relu(
                y.astype(jnp.float32) * (xs * ws) + bias.astype(jnp.float32)
            ).astype(dtype)
        return x

    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = self.convs[0][0].dtype
        x = fold_input(x, self.f)
        if self.normalize is not None:
            mean48, inv_std48 = self.normalize
            x = (x.astype(jnp.float32) / 255.0 - mean48) * inv_std48
        x = x.astype(dtype)
        x = self._stem_convs(x)
        if self.out_f == 1:
            return x
        return depth_to_space(x, self.out_f)


class FusedStage3Frontend(PolyphaseFrontend):
    """PolyphaseFrontend extended through stage 3 (inference, BN-folded).

    The frontend's last conv emits the layer-2 output as an f=2 phase
    tensor; instead of depth-to-space'ing it back to image coordinates and
    immediately re-consuming it with stride 2, stage 3's entry convs are
    phase-folded to read the phase tensor directly (fold_conv_poly with
    f_in=2, f_out=1):

    - b0.conv1 (3x3 s2 32->64)      -> 2x2 s1 conv, 128 -> 64
    - b0.downsample (1x1 s2 32->64) -> 2x2 s1 conv (one live phase)

    The stride-2 convs' MXU lane use quadruples and the d2s round trip
    disappears; the rest of stage 3 (b0.conv2 + residual, block 1) runs in
    image coordinates exactly as the reference computes it.  Use with
    ``drnseg_forward(stem_stages=4)``.  Exactness vs the direct path is
    tested in tests/test_polyphase.py.
    """

    def __init__(self, params, f: int = 4, dtype=jnp.bfloat16,
                 normalize: tuple | None = None, stage3: str = "layer.3",
                 int8_stem: bool = False):
        super().__init__(params, f=f, dtype=dtype, normalize=normalize,
                         int8_stem=int8_stem)
        self.dtype = dtype

        def conv_w(name):
            return np.asarray(params[f"{name}.weight"], np.float32)

        def conv_b(name):
            return np.asarray(params[f"{name}.bias"], np.float32)

        def fold(name, k_pad):
            wp, plo, phi = fold_conv_poly(conv_w(name), 2, k_pad, 2, 1)
            return (jnp.asarray(wp, dtype), jnp.asarray(conv_b(name), dtype),
                    plo, phi)

        assert f"{stage3}.2.conv1.weight" not in params, (
            "FusedStage3Frontend folds a 2-block stage 3 (drn_d_22/24)")
        self.b0_conv1 = fold(f"{stage3}.0.conv1", 1)
        self.b0_ds = fold(f"{stage3}.0.downsample.0", 0)
        self.image_convs = {
            name: (jnp.asarray(conv_w(name), dtype),
                   jnp.asarray(conv_b(name), dtype))
            for name in (f"{stage3}.0.conv2", f"{stage3}.1.conv1",
                         f"{stage3}.1.conv2")
        }
        self.stage3 = stage3

    def _conv(self, x, name, pad=1):
        w, b = self.image_convs[name]
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b

    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = self.dtype
        x = fold_input(x, self.f)
        if self.normalize is not None:
            mean48, inv_std48 = self.normalize
            x = (x.astype(jnp.float32) / 255.0 - mean48) * inv_std48
        x = x.astype(dtype)
        x = self._stem_convs(x)
        # x: layer-2 output on the f=2 phase grid; stage-3 block 0 entry
        w1, b1, lo1, hi1 = self.b0_conv1
        y1 = jax.nn.relu(jax.lax.conv_general_dilated(
            x, w1, (1, 1), [(lo1, hi1), (lo1, hi1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1)
        wd, bd, lod, hid = self.b0_ds
        yd = jax.lax.conv_general_dilated(
            x, wd, (1, 1), [(lod, hid), (lod, hid)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bd
        out = jax.nn.relu(self._conv(y1, f"{self.stage3}.0.conv2") + yd)
        # block 1 (standard basic block, image domain)
        r = out
        out = jax.nn.relu(self._conv(out, f"{self.stage3}.1.conv1"))
        out = jax.nn.relu(self._conv(out, f"{self.stage3}.1.conv2") + r)
        return out


def calibrate_stem_scales(frontend: PolyphaseFrontend, batches) -> list[float]:
    """Static per-conv activation scales for an ``int8_stem`` frontend:
    runs the BF16 stem convs over ``batches`` (uint8 BATCHED frames in
    fold_input form — (n, h, w*c) flat rows or (n, h, w, c)) recording each
    conv's input absmax; returns the 3 scales and installs them on
    ``frontend.stem_x_scales``.

    conv0's analytic scale (exact, from the normalize bounds) is kept when
    present — calibration can only shrink coverage there."""
    scales = [0.0] * len(frontend.convs)
    for fr in batches:
        x = fold_input(jnp.asarray(fr), frontend.f)
        if frontend.normalize is not None:
            mean48, inv_std48 = frontend.normalize
            x = (x.astype(jnp.float32) / 255.0 - mean48) * inv_std48
        x = x.astype(frontend.convs[0][0].dtype)
        for i, (wp, bias, plo, phi) in enumerate(frontend.convs):
            scales[i] = max(
                scales[i],
                float(jnp.max(jnp.abs(x.astype(jnp.float32)))),
            )
            x = jax.lax.conv_general_dilated(
                x, wp, (1, 1), [(plo, phi), (plo, phi)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jax.nn.relu(x + bias)
    out = [max(s, 1e-8) / 127.0 for s in scales]
    if getattr(frontend, "conv0_x_scale", None) is not None:
        out[0] = frontend.conv0_x_scale
    frontend.stem_x_scales = out
    return out


class PolyphaseStem:
    """Precomputed polyphase replacement for a stride-1 KxK stem conv."""

    def __init__(self, w7, bias=None, f: int = 4, pad: int = 3, dtype=jnp.bfloat16):
        w_poly, self.pad_lo, self.pad_hi = fold_stem_weights(
            np.asarray(w7, np.float32), f, pad
        )
        self.w = jnp.asarray(w_poly, dtype)
        self.f = f
        self.bias = None if bias is None else jnp.asarray(bias)

    def __call__(self, x: jax.Array) -> jax.Array:
        f = self.f
        n, h, w, _ = x.shape
        assert h % f == 0 and w % f == 0, (h, w, f)
        x4 = space_to_depth(x.astype(self.w.dtype), f)
        y4 = jax.lax.conv_general_dilated(
            x4,
            self.w,
            window_strides=(1, 1),
            padding=[(self.pad_lo, self.pad_hi), (self.pad_lo, self.pad_hi)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = depth_to_space(y4, f)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y
