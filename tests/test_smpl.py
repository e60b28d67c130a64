"""SMPL LBS tests against an independent numpy oracle + invariance properties."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRotation

from hierarchicalprobabilistic3dhuman_tpu.models.smpl import (
    SMPL, SMPL_PARENTS, NUM_VERTS, synthetic_smpl_params, smpl_forward,
)

RNG = np.random.RandomState(42)


def numpy_lbs_oracle(params, betas, full_pose_rotmats):
    """Straightforward per-example numpy LBS, written independently."""
    v_template = np.asarray(params.v_template)
    shapedirs = np.asarray(params.shapedirs)
    posedirs = np.asarray(params.posedirs)  # (207, V*3)
    J_reg = np.asarray(params.J_regressor)
    W = np.asarray(params.lbs_weights)
    parents = SMPL_PARENTS

    out_verts, out_joints = [], []
    for b in range(betas.shape[0]):
        v_shaped = v_template + shapedirs @ betas[b]
        J = J_reg @ v_shaped  # (24, 3)
        R = full_pose_rotmats[b]  # (24, 3, 3)
        pose_feat = (R[1:] - np.eye(3)).reshape(-1)  # (207,)
        v_posed = v_shaped + (pose_feat @ posedirs).reshape(-1, 3)

        # world transforms
        G = np.zeros((24, 4, 4))
        G[0, :3, :3] = R[0]
        G[0, :3, 3] = J[0]
        G[0, 3, 3] = 1.0
        for i in range(1, 24):
            local = np.eye(4)
            local[:3, :3] = R[i]
            local[:3, 3] = J[i] - J[parents[i]]
            G[i] = G[parents[i]] @ local
        posed_joints = G[:, :3, 3].copy()

        # remove rest-pose joint contribution
        A = G.copy()
        for i in range(24):
            A[i, :3, 3] -= G[i, :3, :3] @ J[i]

        T = np.einsum("vj,jpq->vpq", W, A)
        v_hom = np.concatenate([v_posed, np.ones((NUM_VERTS, 1))], axis=-1)
        verts = np.einsum("vpq,vq->vp", T, v_hom)[:, :3]
        out_verts.append(verts)
        out_joints.append(posed_joints)
    return np.stack(out_verts), np.stack(out_joints)


def test_lbs_matches_numpy_oracle():
    params = synthetic_smpl_params(seed=3)
    B = 3
    betas = RNG.randn(B, 10).astype(np.float32)
    aa = (RNG.randn(B, 24, 3) * 0.3).astype(np.float32)
    R = ScipyRotation.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(B, 24, 3, 3).astype(np.float32)

    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import lbs
    verts, joints = lbs(params, jnp.asarray(betas), jnp.asarray(R))
    verts_np, joints_np = numpy_lbs_oracle(params, betas, R)
    np.testing.assert_allclose(np.asarray(verts), verts_np, atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints), joints_np, atol=2e-5)


def test_neutral_pose_returns_template():
    smpl = SMPL.synthetic()
    out = smpl(batch_size=2)
    np.testing.assert_allclose(np.asarray(out["vertices"][0]),
                               np.asarray(smpl.params.v_template), atol=1e-5)
    assert out["joints"].shape == (2, 90, 3)


def test_global_orient_is_rigid():
    smpl = SMPL.synthetic()
    betas = jnp.asarray(RNG.randn(2, 10).astype(np.float32))
    aa = np.zeros((2, 3), np.float32)
    aa[:, 1] = np.pi / 2
    out_rot = smpl(betas=betas, global_orient=jnp.asarray(aa))
    out_id = smpl(betas=betas)
    R = ScipyRotation.from_rotvec(aa[0]).as_matrix().astype(np.float32)
    # Global orient rotates rigidly about the ROOT JOINT, not the origin.
    root = np.asarray(out_id["joints"])[:, 0:1, :]  # (B, 1, 3)
    expected = (np.asarray(out_id["vertices"]) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(out_rot["vertices"]), expected, atol=1e-4)


def test_pose2rot_paths_agree():
    smpl = SMPL.synthetic()
    B = 2
    betas = jnp.asarray(RNG.randn(B, 10).astype(np.float32))
    body_aa = (RNG.randn(B, 69) * 0.2).astype(np.float32)
    glob_aa = (RNG.randn(B, 3) * 0.2).astype(np.float32)
    out_aa = smpl(betas=betas, body_pose=jnp.asarray(body_aa),
                  global_orient=jnp.asarray(glob_aa))
    body_R = ScipyRotation.from_rotvec(body_aa.reshape(-1, 3)).as_matrix() \
        .reshape(B, 23, 3, 3).astype(np.float32)
    glob_R = ScipyRotation.from_rotvec(glob_aa).as_matrix() \
        .reshape(B, 1, 3, 3).astype(np.float32)
    out_rm = smpl(betas=betas, body_pose=jnp.asarray(body_R),
                  global_orient=jnp.asarray(glob_R), pose2rot=False)
    np.testing.assert_allclose(np.asarray(out_aa["vertices"]),
                               np.asarray(out_rm["vertices"]), atol=1e-4)


def test_transl():
    smpl = SMPL.synthetic()
    t = jnp.asarray(np.array([[1.0, -2.0, 0.5]], np.float32))
    out = smpl(batch_size=1, transl=t)
    out0 = smpl(batch_size=1)
    np.testing.assert_allclose(np.asarray(out["vertices"]),
                               np.asarray(out0["vertices"]) + np.asarray(t)[:, None, :],
                               atol=1e-6)


def test_joint_layout():
    smpl = SMPL.synthetic()
    out = smpl(batch_size=1)
    joints = np.asarray(out["joints"])
    verts = np.asarray(out["vertices"])
    # landmarks are exactly surface vertices
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import EXTRA_LANDMARK_VERTEX_IDS
    np.testing.assert_allclose(joints[0, 24:45], verts[0, EXTRA_LANDMARK_VERTEX_IDS], atol=1e-6)
    # h36m block is regressed with the real (shipped) regressor
    jrh = np.load("model_files/J_regressor_h36m.npy")
    np.testing.assert_allclose(joints[0, 73:90], jrh @ verts[0], atol=1e-5)


def test_vmap_over_samples():
    """Sample axis composes with vmap (predict-time uncertainty path)."""
    import jax
    params = synthetic_smpl_params()
    betas = jnp.asarray(RNG.randn(4, 8, 10).astype(np.float32))  # (B, N, 10)

    def one(b):
        return smpl_forward(params, betas=b)["vertices"]

    verts = jax.vmap(one)(betas)
    assert verts.shape == (4, 8, NUM_VERTS, 3)


def test_mixed_gender_forward_matches_per_gender():
    """smpl_forward_mixed (one-hot-mixed param contractions, ONE forward)
    must equal running each example through its own gendered smpl_forward
    (the eval driver's former 3x-forward + select fallback)."""
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import (
        smpl_forward_mixed)
    plist = [synthetic_smpl_params(seed=s) for s in (0, 1, 2)]
    B = 5
    rng = np.random.RandomState(11)
    code = np.array([0, 1, 2, 1, 0], np.int32)
    betas = jnp.asarray(rng.randn(B, 10).astype(np.float32))
    aa = rng.randn(B, 24, 3).astype(np.float32) * 0.3
    from hierarchicalprobabilistic3dhuman_tpu.utils.rotation_utils import so3_exp
    rotmats = so3_exp(jnp.asarray(aa.reshape(B * 24, 3))).reshape(B, 24, 3, 3)

    mixed = smpl_forward_mixed(plist, jnp.asarray(code),
                               betas=betas, body_pose=rotmats[:, 1:],
                               global_orient=rotmats[:, 0:1], pose2rot=False)

    for b in range(B):
        ref = smpl_forward(plist[int(code[b])], betas=betas[b:b + 1],
                           body_pose=rotmats[b:b + 1, 1:],
                           global_orient=rotmats[b:b + 1, 0:1], pose2rot=False)
        np.testing.assert_allclose(np.asarray(mixed["vertices"][b]),
                                   np.asarray(ref["vertices"][0]),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(mixed["joints"][b]),
                                   np.asarray(ref["joints"][0]), atol=2e-5)
