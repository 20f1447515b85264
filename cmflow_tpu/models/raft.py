"""RAFT-small optical flow (inference) in JAX/flax — NHWC, jittable.

TPU-native re-implementation of the vendored RAFT the reference uses for
camera-modality preprocessing (preprocess/utils/RAFT/core/raft.py:24-143,
extractor.py SmallEncoder, corr.py CorrBlock, update.py SmallUpdateBlock).
The architecture follows the public RAFT-small definition (Teed & Deng,
ECCV'20):

  * feature net: 1/8-resolution 128-d features, instance norm;
  * context net: 160-d (96 hidden + 64 context), no norm;
  * 4-level all-pairs correlation pyramid, lookup radius 3
    (the dense-matmul path — the reference's optional alt_cuda_corr CUDA
    kernel is unnecessary on TPU: the all-pairs matmul IS the MXU path);
  * ConvGRU update block, 12 iterations (lax.scan), bilinear 8x upsampling.

Weights: ``load_torch_raft_small`` converts the public ``raft-small.pth``
torch checkpoint when provided (the reference also requires that download).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

Array = jax.Array


def instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """Non-affine instance norm over spatial dims (NHWC), matching
    torch nn.InstanceNorm2d(affine=False)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


class BottleneckBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instance"

    def _norm(self, x):
        return instance_norm(x) if self.norm == "instance" else x

    @nn.compact
    def __call__(self, x: Array) -> Array:
        q = self.planes // 4
        y = nn.relu(self._norm(nn.Conv(q, (1, 1), name="conv1")(x)))
        # explicit symmetric padding: XLA SAME pads (0, 1) for a strided
        # 3x3 on even inputs where torch's padding=1 pads (1, 1)
        # (extractor.py:65)
        y = nn.relu(self._norm(
            nn.Conv(q, (3, 3), strides=self.stride,
                    padding=((1, 1), (1, 1)), name="conv2")(y)))
        y = nn.relu(self._norm(nn.Conv(self.planes, (1, 1), name="conv3")(y)))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = self._norm(nn.Conv(self.planes, (1, 1), strides=self.stride,
                                   name="downsample")(x))
        return nn.relu(x + y)


class SmallEncoder(nn.Module):
    output_dim: int = 128
    norm: str = "instance"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = instance_norm if self.norm == "instance" else (lambda a: a)
        # torch pads the strided 7x7 symmetrically (3, 3); XLA SAME would
        # pad (2, 3) on even inputs (extractor.py:212)
        x = nn.relu(f(nn.Conv(32, (7, 7), strides=2,
                              padding=((3, 3), (3, 3)), name="conv1")(x)))
        for i, (planes, stride) in enumerate(
                [(32, 1), (32, 1), (64, 2), (64, 1), (96, 2), (96, 1)]):
            x = BottleneckBlock(planes, stride, self.norm,
                                name=f"block_{i}")(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2")(x)


class SmallMotionEncoder(nn.Module):
    corr_channels: int = 4 * (2 * 3 + 1) ** 2  # levels * (2r+1)^2 = 196

    @nn.compact
    def __call__(self, flow: Array, corr: Array) -> Array:
        c = nn.relu(nn.Conv(96, (1, 1), name="convc1")(corr))
        v = nn.relu(nn.Conv(64, (7, 7), name="convf1")(flow))
        v = nn.relu(nn.Conv(32, (3, 3), name="convf2")(v))
        out = nn.relu(nn.Conv(80, (3, 3), name="conv")(
            jnp.concatenate([c, v], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # [.., 82]


class ConvGRU(nn.Module):
    hidden: int = 96

    @nn.compact
    def __call__(self, h: Array, x: Array) -> Array:
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden, (3, 3), name="convz")(hx))
        r = nn.sigmoid(nn.Conv(self.hidden, (3, 3), name="convr")(hx))
        q = nn.tanh(nn.Conv(self.hidden, (3, 3), name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class FlowHead(nn.Module):
    @nn.compact
    def __call__(self, h: Array) -> Array:
        return nn.Conv(2, (3, 3), name="conv2")(
            nn.relu(nn.Conv(128, (3, 3), name="conv1")(h)))


class SmallUpdateBlock(nn.Module):
    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(name="encoder")(flow, corr)
        net = ConvGRU(name="gru")(net, jnp.concatenate([inp, motion], -1))
        delta = FlowHead(name="flow_head")(net)
        return net, delta


def bilinear_sample(img: Array, coords: Array) -> Array:
    """Zero-padded bilinear sampling.

    Args:
      img: ``[B, H, W, C]``.
      coords: ``[B, N, 2]`` (x, y) float pixel coordinates.
    Returns:
      ``[B, N, C]``.
    """
    b, h, w, c = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, yi_c, xi_c)
        return vals * inb[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def corr_pyramid(fmap1: Array, fmap2: Array,
                 num_levels: int = 4) -> Sequence[Array]:
    """All-pairs correlation + average-pool pyramid (corr.py:12-61).

    Returns a list of ``[B*H1*W1, H2/2^i, W2/2^i, 1]`` volumes.
    """
    b, h1, w1, d = fmap1.shape
    _, h2, w2, _ = fmap2.shape
    corr = jnp.einsum("bxyd,buvd->bxyuv", fmap1, fmap2,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(d))
    corr = corr.reshape(b * h1 * w1, h2, w2, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = nn.avg_pool(corr, (2, 2), strides=(2, 2))
        pyramid.append(corr)
    return pyramid


def corr_lookup(pyramid: Sequence[Array], coords: Array,
                radius: int = 3) -> Array:
    """Sample the pyramid in a (2r+1)^2 window around ``coords``
    (corr.py __call__).

    Args:
      coords: ``[B, H1, W1, 2]`` (x, y) at 1/8 resolution.
    Returns:
      ``[B, H1, W1, num_levels*(2r+1)^2]``.
    """
    b, h1, w1, _ = coords.shape
    r = radius
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # channel order must match torch RAFT (corr.py:37-44):
    # delta = stack(meshgrid(dy, dx)) with torch's 'ij' indexing adds
    # (v_i, v_j) to (x, y) — flat channel k = i*(2r+1)+j <-> offset
    # (xoff=v_i, yoff=v_j); 'xy' indexing would transpose the window and
    # scramble converted raft-small.pth correlation channels
    delta = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), axis=-1)
    delta = delta.reshape(-1, 2)  # [(2r+1)^2, 2]

    outs = []
    flat_coords = coords.reshape(b * h1 * w1, 1, 2)
    for i, corr in enumerate(pyramid):
        centroid = flat_coords / (2.0 ** i)
        pts = centroid + delta[None]  # [BHW, K, 2]
        sampled = bilinear_sample(corr, pts)[..., 0]  # [BHW, K]
        outs.append(sampled)
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(b, h1, w1, -1)


def upflow8(flow: Array) -> Array:
    """8x bilinear upsample with 8x magnitude (utils/utils.py:82-84).

    torch uses ``align_corners=True`` — src = dst * (h-1)/(H-1) — while
    ``jax.image.resize`` only offers the half-pixel convention, so the
    interpolation is spelled out with explicit gathers."""
    b, h, w, _ = flow.shape
    hh, ww = 8 * h, 8 * w

    def axis_weights(src_len, dst_len):
        pos = jnp.arange(dst_len, dtype=jnp.float32) * (
            (src_len - 1) / (dst_len - 1))
        i0 = jnp.floor(pos).astype(jnp.int32)
        i0 = jnp.clip(i0, 0, src_len - 2)
        frac = pos - i0.astype(jnp.float32)
        return i0, frac

    y0, fy = axis_weights(h, hh)
    x0, fx = axis_weights(w, ww)

    fy0 = jnp.take(flow, y0, axis=1)
    fy1 = jnp.take(flow, y0 + 1, axis=1)
    rows = fy0 * (1.0 - fy[None, :, None, None]) \
        + fy1 * fy[None, :, None, None]
    cx0 = jnp.take(rows, x0, axis=2)
    cx1 = jnp.take(rows, x0 + 1, axis=2)
    up = cx0 * (1.0 - fx[None, None, :, None]) \
        + cx1 * fx[None, None, :, None]
    return 8.0 * up


class RaftSmall(nn.Module):
    """Inference RAFT-small: ``__call__(image1, image2, iters)`` ->
    full-resolution flow ``[B, H, W, 2]``.

    Images: uint8/float RGB in [0, 255], NHWC, H and W divisible by 8.
    """

    hidden_dim: int = 96
    context_dim: int = 64
    corr_levels: int = 4
    corr_radius: int = 3

    @nn.compact
    def __call__(self, image1: Array, image2: Array,
                 iters: int = 12) -> Array:
        img1 = 2.0 * (image1.astype(jnp.float32) / 255.0) - 1.0
        img2 = 2.0 * (image2.astype(jnp.float32) / 255.0) - 1.0

        fnet = SmallEncoder(128, "instance", name="fnet")
        fmap1 = fnet(img1)
        fmap2 = fnet(img2)
        cmap = SmallEncoder(self.hidden_dim + self.context_dim, "none",
                            name="cnet")(img1)
        net = nn.tanh(cmap[..., :self.hidden_dim])
        inp = nn.relu(cmap[..., self.hidden_dim:])

        pyramid = corr_pyramid(fmap1, fmap2, self.corr_levels)

        b, h, w, _ = fmap1.shape
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        coords0 = jnp.broadcast_to(
            jnp.stack([xs, ys], axis=-1)[None], (b, h, w, 2))

        update = SmallUpdateBlock(name="update_block")

        coords1 = coords0
        for _ in range(iters):
            corr = corr_lookup(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, delta = update(net, inp, corr, flow)
            coords1 = coords1 + delta

        return upflow8(coords1 - coords0)


# ---------------------------------------------------------------------------
# torch checkpoint conversion


def _t2f_conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv kernel -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_raft_small(path: str):
    """Convert the public ``raft-small.pth`` torch checkpoint into flax
    params for :class:`RaftSmall`.  Names follow the official RAFT module
    tree (possibly wrapped in DataParallel 'module.' prefixes)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k.removeprefix("module."): v.numpy() for k, v in sd.items()}

    def conv(prefix):
        out = {"kernel": _t2f_conv(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def encoder(prefix):
        p = {"conv1": conv(f"{prefix}.conv1"),
             "conv2": conv(f"{prefix}.conv2")}
        layer_map = [("layer1", 0), ("layer1", 1), ("layer2", 0),
                     ("layer2", 1), ("layer3", 0), ("layer3", 1)]
        for i, (layer, j) in enumerate(layer_map):
            blk = {f"conv{k}": conv(f"{prefix}.{layer}.{j}.conv{k}")
                   for k in (1, 2, 3)}
            ds = f"{prefix}.{layer}.{j}.downsample.0.weight"
            if ds in sd:
                blk["downsample"] = conv(f"{prefix}.{layer}.{j}.downsample.0")
            p[f"block_{i}"] = blk
        return p

    params = {
        "fnet": encoder("fnet"),
        "cnet": encoder("cnet"),
        "update_block": {
            "encoder": {k: conv(f"update_block.encoder.{k}")
                        for k in ("convc1", "convf1", "convf2", "conv")},
            "gru": {k: conv(f"update_block.gru.{k}")
                    for k in ("convz", "convr", "convq")},
            "flow_head": {
                "conv1": conv("update_block.flow_head.conv1"),
                "conv2": conv("update_block.flow_head.conv2"),
            },
        },
    }
    return jax.tree_util.tree_map(jnp.asarray, params)
