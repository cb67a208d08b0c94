#!/usr/bin/env python
"""Scratch bench: space-to-depth / frontend-entry reformulations on TPU.

Variants (all consume the same raw frame bytes):
  a) current: (1,1024,2048,3) u8 -> bitcast-word s2d -> (256,512,48)
  b) flat input (1,1024,6144) u8 -> bitcast i32 -> transpose -> (256,512,48)
  c) flat input -> 4 strided slices + concat
  d) flat input -> reshape (1024,512,12) -> normalize -> tall conv0
     (13,4,12,256) stride (4,1)  [skips s2d entirely]
  e) copy-only baselines: +1 on each input layout (layout tax probe)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from tpuseg.models import init_drnseg
from tpuseg.ops.fold_bn import fold_bn
from tpuseg.ops.polyphase import FusedStage3Frontend, space_to_depth

H, W = 1024, 2048
INNER = 32
REPS = 3

params, state, spec = init_drnseg(0, "drn_d_22", 19)
folded = fold_bn(params, state, spec)
stem = FusedStage3Frontend(
    folded, normalize=([0.290, 0.328, 0.287], [0.183, 0.187, 0.184])
)

rng = np.random.default_rng(0)
frame_np = rng.integers(0, 256, size=(1, H, W, 3), dtype=np.uint8)
frames4 = jnp.asarray(frame_np)
frames_flat = jnp.asarray(frame_np.reshape(1, H, W * 3))


def timeit(fn, frames, label):
    @jax.jit
    def loop(f0):
        def body(f, _):
            y = fn(f)
            probe = y.astype(jnp.float32).mean()
            f = f + probe.astype(f.dtype)
            return f, probe

        _, probes = jax.lax.scan(body, f0, None, length=INNER)
        return probes.sum()

    _ = float(np.asarray(loop(frames)))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _ = float(np.asarray(loop(frames)))
        times.append(time.perf_counter() - t0)
    ms = min(times) / INNER * 1e3
    print(f"{label:44s} {ms:8.3f} ms", flush=True)
    return ms


# --- e) layout-tax probes ---------------------------------------------------
timeit(lambda x: x + jnp.uint8(1), frames4, "e1: x+1 on (1024,2048,3)")
timeit(lambda x: x + jnp.uint8(1), frames_flat, "e2: x+1 on (1024,6144) flat")

# --- a) current s2d ----------------------------------------------------------
timeit(lambda x: space_to_depth(x, 4), frames4, "a: s2d current (word bitcast)")


# --- b) flat -> i32 transpose ------------------------------------------------
def s2d_flat(xf):
    n = xf.shape[0]
    xi = jax.lax.bitcast_convert_type(
        xf.reshape(n, H, (W * 3) // 4, 4), jnp.int32
    )  # (n, 1024, 1536)
    xi = xi.reshape(n, H // 4, 4, W // 4, 3)
    xi = xi.transpose(0, 1, 3, 2, 4).reshape(n, H // 4, W // 4, 12)
    out = jax.lax.bitcast_convert_type(
        xi.reshape(n, H // 4, W // 4, 12, 1), jnp.uint8
    )
    return out.reshape(n, H // 4, W // 4, 48)


timeit(s2d_flat, frames_flat, "b: s2d from flat input (transpose)")


# --- c) flat -> 4 slices + concat ---------------------------------------------
def s2d_slices(xf):
    n = xf.shape[0]
    xi = jax.lax.bitcast_convert_type(
        xf.reshape(n, H, (W * 3) // 4, 4), jnp.int32
    )
    xi = xi.reshape(n, H // 4, 4, W // 4, 3)
    parts = [xi[:, :, d] for d in range(4)]  # each (n, 256, 512, 3)
    cat = jnp.concatenate(parts, axis=-1)  # (n, 256, 512, 12) order (dy,(dx,c))
    out = jax.lax.bitcast_convert_type(cat[..., None], jnp.uint8)
    return out.reshape(n, H // 4, W // 4, 48)


timeit(s2d_slices, frames_flat, "c: s2d from flat (slices+concat)")


# --- equivalence check (host) -------------------------------------------------
ref = np.asarray(space_to_depth(frames4, 4))
for name, fn in (("b", s2d_flat), ("c", s2d_slices)):
    got = np.asarray(fn(frames_flat))
    assert np.array_equal(ref, got), f"variant {name} mismatch"
print("variants b, c bit-exact vs current s2d")


# --- d) tall conv0, no s2d -----------------------------------------------------
# Wd[kh, kw, (dx,c), (a,b,o)]: kh = a+p-3+3, kw-1 = floor((b+q-3)/4),
# dx = (b+q-3) mod 4
w7 = np.asarray(folded["layer.0.0.weight"], np.float32)  # (7,7,3,16)
b0 = np.asarray(folded["layer.0.0.bias"], np.float32)
O = w7.shape[3]
Wd = np.zeros((13, 4, 12, 4 * 4 * O), np.float32)
for a in range(4):
    for b in range(4):
        for p in range(7):
            for q in range(7):
                kh = a + p - 3 + 3
                t = b + q - 3
                kw = t // 4 + 1
                dx = t % 4
                Wd[kh, kw, dx * 3 : dx * 3 + 3, (a * 4 + b) * O : (a * 4 + b + 1) * O] = w7[p, q]
Wd_j = jnp.asarray(Wd, jnp.bfloat16)
bias_d = jnp.asarray(np.tile(b0, 16), jnp.bfloat16)
mean12 = jnp.asarray(np.tile([0.290, 0.328, 0.287], 4), jnp.float32)
istd12 = jnp.asarray(np.tile(1.0 / np.array([0.183, 0.187, 0.184]), 4), jnp.float32)


def conv0_tall(xf):
    n = xf.shape[0]
    x = xf.reshape(n, H, W // 4, 12)
    x = ((x.astype(jnp.float32) / 255.0 - mean12) * istd12).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        x, Wd_j, (4, 1), [(3, 6), (1, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + bias_d)


def conv0_current(x4):
    x = space_to_depth(x4, 4)
    mean48, inv_std48 = stem.normalize
    x = ((x.astype(jnp.float32) / 255.0) - mean48) * inv_std48
    x = x.astype(jnp.bfloat16)
    wp, bias, plo, phi = stem.convs[0]
    y = jax.lax.conv_general_dilated(
        x, wp, (1, 1), [(plo, phi), (plo, phi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + bias)


t_cur = timeit(conv0_current, frames4, "s2d+norm+conv0 current")
t_tall = timeit(conv0_tall, frames_flat, "d: norm+tall-conv0 from flat (no s2d)")

ya = np.asarray(conv0_current(frames4).astype(jnp.float32))
yb = np.asarray(conv0_tall(frames_flat).astype(jnp.float32))
err = np.max(np.abs(ya - yb)) / (np.max(np.abs(ya)) + 1e-9)
print(f"d vs current rel err: {err:.2e}")
