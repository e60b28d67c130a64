"""Hierarchical kinematic matrix-Fisher pose + Gaussian shape predictor.

The paper's core model (reference: models/poseMF_shapeGaussian_net.py:24-162),
rebuilt as a flax module:

  * ResNet-18/50 encoder over the 18-channel proxy representation;
  * shape head -> diagonal Gaussian (mean, log std) over SMPL betas;
  * glob/cam heads predict DELTAS against registered initial estimates
    (identity rot6d, [0.9, 0, 0] weak-perspective cam);
  * hierarchical pose head: one 2-layer MLP per body joint, consuming the
    embedding plus ALL ancestors' (U_proper, S_proper, mode rotation) —
    evaluated DEPTH-GROUPED: all joints at the same kinematic depth share an
    input width, so each depth becomes one batched einsum + one batched SVD
    (~7 sequential stages instead of 23; identical math and parameter tree
    to the per-joint form);
  * per-joint 3x3 SVD via the batched Jacobi kernel (ops.svd3) — on-device,
    no CPU round-trips (the reference hops GPU->CPU->GPU per joint :137-141).

Note on SVD sign conventions: U/V column signs are implementation-defined
(LAPACK vs Jacobi). Within this framework they are deterministic and
self-consistent (training and inference see the same function). Converted
torch checkpoints reproduce the first kinematic level exactly; deeper levels
can differ where the torch run's LAPACK sign choices differed — re-finetuning
restores exact parity.
"""

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from hierarchicalprobabilistic3dhuman_tpu.models.resnet import resnet18, resnet50
from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL_PARENTS
from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import (
    proper_svd3x3, proper_svd3x3_lapack, proper_svd3x3_gesdd)


def immediate_parents_to_all_parents(immediate_parents):
    """Per-body-joint ancestor lists (reference :14-21).

    :param immediate_parents: length-24 parents incl. root (root = -1)
    :return: dict body-joint index (0..22) -> list of ancestor body-joint indices
    """
    parents_dict = {}
    for i in range(1, len(immediate_parents)):
        joint = i - 1
        immediate_parent = immediate_parents[i] - 1
        if immediate_parent >= 0:
            parents_dict[joint] = [immediate_parent] + parents_dict.get(immediate_parent, [])
        else:
            parents_dict[joint] = []
    return parents_dict


# rot6d of the identity rotation in the framework's row-interleaved layout.
_INIT_GLOB = np.array([1.0, 0.0, 0.0, 1.0, 0.0, 0.0], dtype=np.float32)
_INIT_CAM = np.array([0.9, 0.0, 0.0], dtype=np.float32)


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact leaf names/initialisers.

    Declares (kernel, bias) without applying them, so the depth-grouped head
    can STACK same-depth joints' kernels into one batched matmul while the
    parameter tree (params["fc_pose_{j}_{l}"]["kernel"/"bias"]) — and the
    RNG path that seeds it — stays bit-identical to the per-joint nn.Dense
    formulation (torch converter and checkpoints unaffected)."""
    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.features_in, self.features_out))
        bias = self.param("bias", nn.initializers.zeros, (self.features_out,))
        return kernel, bias


class PoseMFShapeGaussianNet(nn.Module):
    """Input (B, C, D, D) proxy representation -> distribution parameters."""
    smpl_parents: Sequence[int] = tuple(int(p) for p in SMPL_PARENTS)
    num_in_channels: int = 18
    num_resnet_layers: int = 18
    embed_dim: int = 256
    delta_i: bool = True
    delta_i_weight: float = 1.0
    num_smpl_betas: int = 10
    svd_sweeps: int = 8
    # "jacobi": on-device branch-free kernel (default; fast, differentiable).
    # "lapack": DEVICE-NATIVE gesdd emulation with the torch reference's
    #           sign conventions — use for converted-checkpoint inference
    #           parity on any backend, including TPU (see
    #           ops/lapack_svd3.py; not differentiable).
    # "lapack_callback": host-callback numpy gesdd (bit-exact oracle;
    #           CPU-capable backends only — axon PJRT rejects callbacks).
    svd_impl: str = "jacobi"
    # Encoder conv COMPUTE dtype (mixed precision). None = f32 (reference
    # parity, the default); jnp.bfloat16 doubles encoder MXU throughput.
    # Params, BatchNorm and the distribution head always stay f32, so the
    # parameter tree / converters are identical in both modes.
    encoder_dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False, input_feats=None):
        parents_dict = immediate_parents_to_all_parents(list(self.smpl_parents))
        num_joints = len(parents_dict)

        if self.num_resnet_layers == 18:
            encoder = resnet18(in_channels=self.num_in_channels,
                               dtype=self.encoder_dtype)
            fc1_dim = 512
        elif self.num_resnet_layers == 50:
            encoder = resnet50(in_channels=self.num_in_channels,
                               dtype=self.encoder_dtype)
            fc1_dim = 1024
        else:
            raise ValueError(f"Unsupported resnet depth {self.num_resnet_layers}")

        if input_feats is None:
            input_feats = encoder(inputs, train=train)
        B = input_feats.shape[0]

        # The head runs with FULL f32 matmul precision. TPU backends default
        # f32 matmuls to bf16 passes; bf16-rounded F matrices collide singular
        # values, and the SVD differential's 1/(s_i^2 - s_j^2) terms then blow
        # up — measured: stage-2 training NaNs at ~iter 12 under the default,
        # stable under f32 (benchmarks/train_step.py). The head's Dense layers
        # are tiny next to the encoder convs (which stay fast/bf16), so this
        # costs nothing.
        with jax.default_matmul_precision("highest"):
            return self._head(input_feats, B, parents_dict, num_joints)

    def _head(self, input_feats, B, parents_dict, num_joints):
        """Head body; called from the compact __call__ (all submodules carry
        explicit names, so the helper shares __call__'s parameter scope)."""
        if self.num_resnet_layers == 18:
            fc1_dim = 512
        else:
            fc1_dim = 1024
        x = nn.elu(nn.Dense(fc1_dim, name="fc1")(input_feats))

        shape_params = nn.Dense(self.num_smpl_betas * 2, name="fc_shape")(x)
        shape_mean = shape_params[:, :self.num_smpl_betas]
        shape_log_std = shape_params[:, self.num_smpl_betas:]

        delta_cam = nn.Dense(3, name="fc_cam")(x)
        delta_glob = nn.Dense(6, name="fc_glob")(x)
        glob = delta_glob + jnp.asarray(_INIT_GLOB)
        cam = delta_cam + jnp.asarray(_INIT_CAM)

        embed = nn.elu(nn.Dense(self.embed_dim, name="fc_embed")(
            jnp.concatenate([input_feats, shape_params, glob, cam], axis=1)))

        eye = jnp.eye(3, dtype=embed.dtype)
        hidden = self.embed_dim // 2

        # Depth-grouped evaluation of the hierarchical head. The reference
        # (and the round-1 build) loops the 23 joints SEQUENTIALLY; but a
        # joint only needs its ANCESTORS' outputs, and every joint at tree
        # depth d has exactly d ancestors (so identical MLP input width).
        # Grouping by depth turns 23 serial {2 matmuls + SVD} chains into
        # max_depth (~7) batched stages — each group's per-joint kernels
        # stack into ONE einsum over a (B, G, .) batch. Identical math and
        # identical parameter tree to the serial form (see _DenseParams).
        depth_groups = {}
        for joint in range(num_joints):
            depth_groups.setdefault(len(parents_dict[joint]), []).append(joint)

        F_j, U_j, S_j, V_j, Up_j, Sp_j, mode_j = ({} for _ in range(7))
        for depth in sorted(depth_groups):
            group = depth_groups[depth]
            d_in = self.embed_dim + 21 * depth
            ins = []
            for joint in group:
                parents = parents_dict[joint]
                if parents:
                    anc_Up = jnp.concatenate(
                        [Up_j[p].reshape(B, 9) for p in parents], axis=1)
                    anc_Sp = jnp.concatenate([Sp_j[p] for p in parents], axis=1)
                    anc_mode = jnp.concatenate(
                        [mode_j[p].reshape(B, 9) for p in parents], axis=1)
                    ins.append(jnp.concatenate([embed, anc_Up, anc_Sp, anc_mode],
                                               axis=1))
                else:
                    ins.append(embed)
            x = jnp.stack(ins, axis=1)                       # (B, G, d_in)

            w0, b0, w1, b1 = [], [], [], []
            for joint in group:
                k, b = _DenseParams(d_in, hidden,
                                    name=f"fc_pose_{joint}_0")()
                w0.append(k), b0.append(b)
                k, b = _DenseParams(hidden, 9, name=f"fc_pose_{joint}_1")()
                w1.append(k), b1.append(b)
            W0 = jnp.stack(w0)                               # (G, d_in, H)
            W1 = jnp.stack(w1)                               # (G, H, 9)
            h = nn.elu(jnp.einsum("bgi,gih->bgh", x, W0) + jnp.stack(b0))
            group_F = (jnp.einsum("bgh,gho->bgo", h, W1) + jnp.stack(b1)) \
                .reshape(B, len(group), 3, 3)
            if self.delta_i:
                group_F = group_F + self.delta_i_weight * eye

            if self.svd_impl == "lapack":
                svd = proper_svd3x3_gesdd(group_F)
            elif self.svd_impl == "lapack_callback":
                svd = proper_svd3x3_lapack(group_F)
            else:
                svd = proper_svd3x3(group_F, n_sweeps=self.svd_sweeps)
            for gi, joint in enumerate(group):
                F_j[joint] = group_F[:, gi]
                U_j[joint] = svd["U"][:, gi]
                S_j[joint] = svd["S"][:, gi]
                V_j[joint] = svd["V"][:, gi]
                Up_j[joint] = svd["U_proper"][:, gi]
                Sp_j[joint] = svd["S_proper"][:, gi]
                mode_j[joint] = svd["mode"][:, gi]

        F_list = [F_j[j] for j in range(num_joints)]
        U_list = [U_j[j] for j in range(num_joints)]
        S_list = [S_j[j] for j in range(num_joints)]
        V_list = [V_j[j] for j in range(num_joints)]
        Up_list = [Up_j[j] for j in range(num_joints)]
        Sp_list = [Sp_j[j] for j in range(num_joints)]
        mode_list = [mode_j[j] for j in range(num_joints)]

        out = {
            "pose_params_F": jnp.stack(F_list, axis=1),
            "pose_params_U": jnp.stack(U_list, axis=1),
            "pose_params_S": jnp.stack(S_list, axis=1),
            "pose_params_V": jnp.stack(V_list, axis=1),
            "pose_params_U_proper": jnp.stack(Up_list, axis=1),
            "pose_params_S_proper": jnp.stack(Sp_list, axis=1),
            "pose_rotmats_mode": jnp.stack(mode_list, axis=1),
            "shape_mean": shape_mean,
            "shape_log_std": shape_log_std,
            "glob": glob,
            "cam": cam,
        }
        return out


def torch_to_flax_predictor(state_dict, num_joints=23, resnet_layers=(2, 2, 2, 2)):
    """Convert a reference predictor state_dict (numpy arrays) to flax params.

    Layout mapping: image_encoder.* via torch_to_flax_resnet; Dense layers
    transpose (out, in) -> (in, out); per-joint Sequential fc_pose.{j}.{0,2}
    -> fc_pose_{j}_{0,1}.
    """
    from hierarchicalprobabilistic3dhuman_tpu.models.resnet import torch_to_flax_resnet

    enc_sd = {k[len("image_encoder."):]: v for k, v in state_dict.items()
              if k.startswith("image_encoder.")}
    enc = torch_to_flax_resnet(enc_sd, layers=resnet_layers)

    def dense(prefix):
        return {"kernel": np.asarray(state_dict[prefix + ".weight"]).T,
                "bias": np.asarray(state_dict[prefix + ".bias"])}

    params = {"ResNet_0": enc["params"]}
    batch_stats = {"ResNet_0": enc["batch_stats"]}
    for name in ["fc1", "fc_shape", "fc_cam", "fc_glob", "fc_embed"]:
        params[name] = dense(name)
    for j in range(num_joints):
        params[f"fc_pose_{j}_0"] = dense(f"fc_pose.{j}.0")
        params[f"fc_pose_{j}_1"] = dense(f"fc_pose.{j}.2")
    return {"params": params, "batch_stats": batch_stats}
