"""HRNet-W48 2D-pose network, flax.linen, NHWC compute layout.

Architecture mirrors the reference's torch implementation
(models/pose2D_hrnet.py:275-460, itself MSRA's deep-high-resolution-net):
stem (2x stride-2 3x3 convs) -> layer1 (4 Bottlenecks, 256 ch) ->
transitions + 3 multi-resolution stages with BASIC blocks at channel widths
[48, 96, 192, 384] and SUM-fused exchange units -> final 1x1 conv to 17 joint
heatmaps. Input 384(h)x288(w), heatmaps 96x72. Inference-only (like the
reference, which loads weights with strict=False and never trains it).

A torch->flax converter (torch_to_flax_hrnet) maps the published .pth
checkpoints; names below are chosen to make that mapping mechanical.
"""

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

# Stage topology for HRNet-W48 (configs/pose2d_hrnet_config.py).
STAGE2 = {"num_modules": 1, "num_branches": 2, "num_blocks": 4, "channels": (48, 96)}
STAGE3 = {"num_modules": 4, "num_branches": 3, "num_blocks": 4, "channels": (48, 96, 192)}
STAGE4 = {"num_modules": 3, "num_branches": 4, "num_blocks": 4, "channels": (48, 96, 192, 384)}


def _bn(name, train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        y = _bn("bn1", train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(y)
        y = _bn("bn2", train)(y)
        if self.downsample:
            residual = nn.Conv(self.features, (1, 1), strides=(self.strides,) * 2,
                               use_bias=False, name="downsample_conv")(x)
            residual = _bn("downsample_bn", train)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_bn("bn1", train)(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(y)
        y = nn.relu(_bn("bn2", train)(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = _bn("bn3", train)(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1), strides=(self.strides,) * 2,
                               use_bias=False, name="downsample_conv")(x)
            residual = _bn("downsample_bn", train)(residual)
        return nn.relu(y + residual)


def _upsample_nearest(x, factor):
    # broadcast+reshape nearest upsample: XLA lowers this to a broadcast,
    # not the gather jax.image.resize emits (profiled as "data formatting"
    # time on TPU).
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (B, H, factor, W, factor, C))
    return x.reshape(B, H * factor, W * factor, C)


# ---------------------------------------------------------------------------
# Width-folded branch-0 (TPU MXU efficiency)
#
# The 48-channel branch-0 convs dominate HRNet-W48 on TPU: with C=48 both
# the contraction (K) and output (N) dims waste 128-wide MXU lanes
# (measured ~24 TF/s bf16, the K=48 9-tap lowering ceiling). Folding WIDTH
# into channels — (B, H, W, 48) -> (B, H, W/2, 96), a FREE reshape in NHWC
# row-major — and running the blocks with block-structured (3, 3, 96, 96)
# kernels doubles the logical FLOPs but triples lane efficiency
# (measured 71 us vs 124 us marginal per conv, benchmarks/conv_micro2.py).
# Boundary semantics are exact: the folded taps that would read beyond the
# original padding have identically-zero weight blocks.
# ---------------------------------------------------------------------------


def _fold_selector():
    """Constant T[dx, dxf, sx, ox] in {0,1}: original tap dx serving output
    sub-col ox lands at folded tap dxf, input sub-col sx
    (ox + dx - 1 = 2*(dxf - 1) + sx)."""
    T = np.zeros((3, 3, 2, 2), np.float32)
    for ox in range(2):
        for dx in range(3):
            t = ox + dx - 1
            sx = t % 2
            dxf = (t - sx) // 2 + 1
            T[dx, dxf, sx, ox] = 1.0
    return T


_FOLD_T = _fold_selector()


def fold_conv3x3_width(w):
    """(3, 3, C, C) HWIO kernel -> (3, 3, 2C, 2C) width-folded kernel.

    Output col 2*jf + ox of the original conv reads original cols
    2*jf + ox + dx - 1 (dx in 0..2); in folded coordinates that is folded
    col jf + dxf, sub-col sx with ox + dx - 1 = 2*dxf + sx. One einsum with
    a constant 0/1 selector (not 6 dynamic-update-slices — those cost real
    per-forward time on TPU since the weights are traced inputs)."""
    C = w.shape[-1]
    wf = jnp.einsum("kdio,dfsp->kfsipo", w, jnp.asarray(_FOLD_T, w.dtype))
    return wf.reshape(3, 3, 2 * C, 2 * C)


class _ConvKernel(nn.Module):
    """Parameter-only stand-in matching nn.Conv's {kernel} tree."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _BNStats(nn.Module):
    """Parameter-only stand-in matching nn.BatchNorm's variable tree."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,))).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,))).value
        return scale, bias, mean, var


class FoldedBasicBlock(nn.Module):
    """BasicBlock computed in width-folded layout.

    Owns the SAME parameter tree as BasicBlock (conv1/bn1/conv2/bn2 with
    original (3, 3, C, C) kernels and (C,) batch norms), so checkpoints and
    the torch converter are untouched; the kernel fold + BN tiling happen
    in-graph (a few thousand elements, constant-folded against the weights
    per compilation). Inference-only, like the reference HRNet."""
    features: int

    @nn.compact
    def __call__(self, x_folded):
        C = self.features

        def bn_folded(name, y):
            scale, bias, mean, var = _BNStats(C, name=name)()
            s = (scale * jax.lax.rsqrt(var + 1e-5))
            b = bias - mean * s
            return y * jnp.tile(s, 2) + jnp.tile(b, 2)

        k1 = _ConvKernel((3, 3, C, C), name="conv1")()
        k2 = _ConvKernel((3, 3, C, C), name="conv2")()
        residual = x_folded
        y = jax.lax.conv_general_dilated(
            x_folded, fold_conv3x3_width(k1), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = nn.relu(bn_folded("bn1", y))
        y = jax.lax.conv_general_dilated(
            y, fold_conv3x3_width(k2), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = bn_folded("bn2", y)
        return nn.relu(y + residual)


def fold_width(x):
    """(B, H, W, C) -> (B, H, W/2, 2C): a reshape in NHWC row-major.

    NOTE: on TPU the tiled (8, 128) physical layout makes this a relayout,
    not a bitcast — so the model keeps branch 0 folded END-TO-END (one fold
    after transition1, one unfold before final_layer) instead of folding
    per block."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // 2, 2 * C)


def unfold_width(x):
    B, H, Wf, C2 = x.shape
    return x.reshape(B, H, Wf * 2, C2 // 2)


def fold_conv3x3_stride2_width_in(w):
    """(3, 3, C, Co) stride-2 kernel -> (3, 2, 2C, Co) folded-INPUT kernel.

    Strided output col j reads original cols 2j-1, 2j, 2j+1 = folded
    (j-1, sub1), (j, sub0), (j, sub1): a 2-tap folded-W kernel, applied with
    window strides (2, 1) and padding ((1,1), (1,0)). Used by the fuse
    downsample paths that consume the folded branch 0."""
    C, Co = w.shape[2:]
    T2 = np.zeros((3, 2, 2), np.float32)
    T2[0, 0, 1] = T2[1, 1, 0] = T2[2, 1, 1] = 1.0
    wd = jnp.einsum("kdio,dgs->kgsio", w, jnp.asarray(T2, w.dtype))
    return wd.reshape(3, 2, 2 * C, Co)


def _upsample_into_folded(v, j):
    """Branch-j fuse contribution (Hj, Wj, C) -> folded branch-0 layout
    (H0, W0/2, 2C) without materialising the unfolded tensor: upsample H by
    2^j and W by 2^(j-1), then duplicate channels (both sub-cols of a folded
    pixel read the same nearest-neighbour source)."""
    f = 2 ** j
    B, H, W, C = v.shape
    if j >= 1:
        wrep = f // 2
        v = jnp.broadcast_to(v[:, :, None, :, None, :],
                             (B, H, f, W, wrep, C)) \
            .reshape(B, H * f, W * wrep, C)
    return jnp.concatenate([v, v], axis=-1)


class HighResolutionModule(nn.Module):
    """One exchange unit: per-branch BASIC blocks + SUM fusion across scales.

    With fold_branch0 (inference only), branch 0's block chain runs in the
    width-folded layout (see FoldedBasicBlock); the fold/unfold at the
    module boundary are free reshapes, so transitions and fuse layers are
    untouched."""
    num_branches: int
    num_blocks: int
    channels: Sequence[int]
    multi_scale_output: bool = True
    fold_branch0: bool = False

    @nn.compact
    def __call__(self, xs, train=False):
        folded = self.fold_branch0 and not train
        # Branches. With `folded`, xs[0]/ys[0] are in the width-folded
        # layout for the WHOLE module (incl. fusion) — no relayouts.
        ys = []
        for b in range(self.num_branches):
            y = xs[b]
            if b == 0 and folded:
                for k in range(self.num_blocks):
                    y = FoldedBasicBlock(self.channels[0],
                                         name=f"branch0_block{k}")(y)
            else:
                for k in range(self.num_blocks):
                    y = BasicBlock(self.channels[b],
                                   name=f"branch{b}_block{k}")(y, train)
            ys.append(y)

        if self.num_branches == 1:
            return ys

        # Fuse layers (reference :188-244): j > i upsample path, j < i strided path.
        n_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    v = ys[j]
                elif j > i:
                    v = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                name=f"fuse{i}_{j}_conv")(ys[j])
                    v = _bn(f"fuse{i}_{j}_bn", train)(v)
                    if i == 0 and folded:
                        v = _upsample_into_folded(v, j)
                    else:
                        v = _upsample_nearest(v, 2 ** (j - i))
                else:
                    v = ys[j]
                    for k in range(i - j):
                        out_ch = self.channels[i] if k == i - j - 1 else self.channels[j]
                        if j == 0 and k == 0 and folded:
                            # first conv of the chain consumes the FOLDED
                            # branch 0: 2-tap folded-W stride-(2,1) kernel
                            kern = _ConvKernel((3, 3, self.channels[0], out_ch),
                                               name=f"fuse{i}_{j}_conv{k}")()
                            v = jax.lax.conv_general_dilated(
                                v, fold_conv3x3_stride2_width_in(kern),
                                (2, 1), ((1, 1), (1, 0)),
                                dimension_numbers=("NHWC", "HWIO", "NHWC"))
                        else:
                            v = nn.Conv(out_ch, (3, 3), strides=(2, 2),
                                        padding=((1, 1), (1, 1)), use_bias=False,
                                        name=f"fuse{i}_{j}_conv{k}")(v)
                        v = _bn(f"fuse{i}_{j}_bn{k}", train)(v)
                        if k != i - j - 1:
                            v = nn.relu(v)
                acc = v if acc is None else acc + v
            fused.append(nn.relu(acc))
        return fused


class PoseHighResolutionNet(nn.Module):
    """Input (B, 3, H, W) NCHW like the reference; output (B, 17, H/4, W/4).

    fold_branch0_width (default on, inference only): run the dominant
    48-channel branch-0 block chains in a width-folded layout for ~3x the
    MXU lane efficiency (see FoldedBasicBlock). Parameter tree and numerics
    (up to float reassociation) are identical either way —
    tests/test_hrnet.py::test_folded_branch0_matches_unfolded.

    width/stage_modules parameterise reduced variants (branch channels are
    width x (1, 2, 4, 8); stem/layer1 stay at the W48 sizes) for in-env
    smoke training — e.g. the keypoint-bootstrap detector validation
    (benchmarks/detector_validation.py), which needs a trainable-here
    heatmap net, not the full 63M-param W48. Defaults reproduce HRNet-W48
    exactly (same parameter tree, same numerics)."""
    num_joints: int = 17
    fold_branch0_width: bool = True
    width: int = 48
    stage_modules: Sequence[int] = (1, 4, 3)

    @nn.compact
    def __call__(self, x, train=False, input_layout="NCHW"):
        if input_layout == "NCHW":
            x = jnp.transpose(x, (0, 2, 3, 1))
        w = self.width

        # Stem
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv1")(x)
        x = nn.relu(_bn("bn1", train)(x))
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(x)
        x = nn.relu(_bn("bn2", train)(x))

        # layer1: 4 Bottlenecks at 64 (out 256)
        for k in range(4):
            x = Bottleneck(64, downsample=(k == 0), name=f"layer1_{k}")(x, train)

        # transition1: 256 -> [w, 2w] (both have convs; branch 1 is strided)
        x0 = nn.Conv(w, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     name="transition1_0_conv")(x)
        x0 = nn.relu(_bn("transition1_0_bn", train)(x0))
        fold = self.fold_branch0_width and not train
        if fold:
            # branch 0 stays width-folded from here to final_layer (one
            # relayout in, one out; see the fold_width notes above)
            x0 = fold_width(x0)
        x1 = nn.Conv(2 * w, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     use_bias=False, name="transition1_1_conv")(x)
        x1 = nn.relu(_bn("transition1_1_bn", train)(x1))
        xs = [x0, x1]

        for m in range(self.stage_modules[0]):
            xs = HighResolutionModule(2, 4, (w, 2 * w),
                                      fold_branch0=fold,
                                      name=f"stage2_{m}")(xs, train)

        # transition2: add 4w branch from the last existing branch
        x2 = nn.Conv(4 * w, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     use_bias=False, name="transition2_2_conv")(xs[-1])
        x2 = nn.relu(_bn("transition2_2_bn", train)(x2))
        xs = [xs[0], xs[1], x2]

        for m in range(self.stage_modules[1]):
            xs = HighResolutionModule(3, 4, (w, 2 * w, 4 * w),
                                      fold_branch0=fold,
                                      name=f"stage3_{m}")(xs, train)

        # transition3: add 8w branch
        x3 = nn.Conv(8 * w, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     use_bias=False, name="transition3_3_conv")(xs[-1])
        x3 = nn.relu(_bn("transition3_3_bn", train)(x3))
        xs = [xs[0], xs[1], xs[2], x3]

        for m in range(self.stage_modules[2]):
            last = m == self.stage_modules[2] - 1
            xs = HighResolutionModule(4, 4, (w, 2 * w, 4 * w, 8 * w),
                                      multi_scale_output=not last,
                                      fold_branch0=fold,
                                      name=f"stage4_{m}")(xs, train)

        x_final = unfold_width(xs[0]) if fold else xs[0]
        out = nn.Conv(self.num_joints, (1, 1), name="final_layer")(x_final)
        return jnp.transpose(out, (0, 3, 1, 2))  # back to NCHW heatmaps


# ---------------------------------------------------------------------------
# torch -> flax conversion for published HRNet-W48 .pth checkpoints
# ---------------------------------------------------------------------------

def torch_to_flax_hrnet(state_dict):
    """Map the reference HRNet state_dict (numpy arrays) to flax variables."""
    params, stats = {}, {}

    def conv_w(key):
        return np.transpose(np.asarray(state_dict[key]), (2, 3, 1, 0))

    def put_conv(fname, tkey, bias=False):
        p = {"kernel": conv_w(tkey + ".weight")}
        if bias:
            p["bias"] = np.asarray(state_dict[tkey + ".bias"])
        params[fname] = p

    def put_bn(fname, tkey):
        params[fname] = {"scale": np.asarray(state_dict[tkey + ".weight"]),
                         "bias": np.asarray(state_dict[tkey + ".bias"])}
        stats[fname] = {"mean": np.asarray(state_dict[tkey + ".running_mean"]),
                        "var": np.asarray(state_dict[tkey + ".running_var"])}

    def put_block(fdict_name, tprefix, n_convs):
        bp, bs = {}, {}
        for c in range(1, n_convs + 1):
            bp[f"conv{c}"] = {"kernel": conv_w(f"{tprefix}.conv{c}.weight")}
            bp[f"bn{c}"] = {"scale": np.asarray(state_dict[f"{tprefix}.bn{c}.weight"]),
                            "bias": np.asarray(state_dict[f"{tprefix}.bn{c}.bias"])}
            bs[f"bn{c}"] = {"mean": np.asarray(state_dict[f"{tprefix}.bn{c}.running_mean"]),
                            "var": np.asarray(state_dict[f"{tprefix}.bn{c}.running_var"])}
        if f"{tprefix}.downsample.0.weight" in state_dict:
            bp["downsample_conv"] = {"kernel": conv_w(f"{tprefix}.downsample.0.weight")}
            bp["downsample_bn"] = {"scale": np.asarray(state_dict[f"{tprefix}.downsample.1.weight"]),
                                   "bias": np.asarray(state_dict[f"{tprefix}.downsample.1.bias"])}
            bs["downsample_bn"] = {"mean": np.asarray(state_dict[f"{tprefix}.downsample.1.running_mean"]),
                                   "var": np.asarray(state_dict[f"{tprefix}.downsample.1.running_var"])}
        params[fdict_name] = bp
        stats[fdict_name] = bs

    put_conv("conv1", "conv1"); put_bn("bn1", "bn1")
    put_conv("conv2", "conv2"); put_bn("bn2", "bn2")
    for k in range(4):
        put_block(f"layer1_{k}", f"layer1.{k}", 3)

    put_conv("transition1_0_conv", "transition1.0.0")
    put_bn("transition1_0_bn", "transition1.0.1")
    put_conv("transition1_1_conv", "transition1.1.0.0")
    put_bn("transition1_1_bn", "transition1.1.0.1")

    def put_stage(stage_idx, spec):
        for m in range(spec["num_modules"]):
            mp, ms = {}, {}
            for b in range(spec["num_branches"]):
                for k in range(spec["num_blocks"]):
                    t = f"stage{stage_idx}.{m}.branches.{b}.{k}"
                    bp, bs = {}, {}
                    for c in (1, 2):
                        bp[f"conv{c}"] = {"kernel": conv_w(f"{t}.conv{c}.weight")}
                        bp[f"bn{c}"] = {"scale": np.asarray(state_dict[f"{t}.bn{c}.weight"]),
                                        "bias": np.asarray(state_dict[f"{t}.bn{c}.bias"])}
                        bs[f"bn{c}"] = {"mean": np.asarray(state_dict[f"{t}.bn{c}.running_mean"]),
                                        "var": np.asarray(state_dict[f"{t}.bn{c}.running_var"])}
                    mp[f"branch{b}_block{k}"] = bp
                    ms[f"branch{b}_block{k}"] = bs
            n_out = spec["num_branches"]
            last_module = m == spec["num_modules"] - 1
            if stage_idx == 4 and last_module:
                n_out = 1
            for i in range(n_out):
                for j in range(spec["num_branches"]):
                    t = f"stage{stage_idx}.{m}.fuse_layers.{i}.{j}"
                    if j == i:
                        continue
                    if j > i:
                        mp[f"fuse{i}_{j}_conv"] = {"kernel": conv_w(f"{t}.0.weight")}
                        mp[f"fuse{i}_{j}_bn"] = {"scale": np.asarray(state_dict[f"{t}.1.weight"]),
                                                 "bias": np.asarray(state_dict[f"{t}.1.bias"])}
                        ms[f"fuse{i}_{j}_bn"] = {"mean": np.asarray(state_dict[f"{t}.1.running_mean"]),
                                                 "var": np.asarray(state_dict[f"{t}.1.running_var"])}
                    else:
                        for k in range(i - j):
                            mp[f"fuse{i}_{j}_conv{k}"] = {"kernel": conv_w(f"{t}.{k}.0.weight")}
                            mp[f"fuse{i}_{j}_bn{k}"] = {"scale": np.asarray(state_dict[f"{t}.{k}.1.weight"]),
                                                        "bias": np.asarray(state_dict[f"{t}.{k}.1.bias"])}
                            ms[f"fuse{i}_{j}_bn{k}"] = {"mean": np.asarray(state_dict[f"{t}.{k}.1.running_mean"]),
                                                        "var": np.asarray(state_dict[f"{t}.{k}.1.running_var"])}
            params[f"stage{stage_idx}_{m}"] = mp
            stats[f"stage{stage_idx}_{m}"] = ms

    put_stage(2, STAGE2)
    put_conv("transition2_2_conv", "transition2.2.0.0")
    put_bn("transition2_2_bn", "transition2.2.0.1")
    put_stage(3, STAGE3)
    put_conv("transition3_3_conv", "transition3.3.0.0")
    put_bn("transition3_3_bn", "transition3.3.0.1")
    put_stage(4, STAGE4)
    put_conv("final_layer", "final_layer", bias=True)

    return {"params": params, "batch_stats": stats}
