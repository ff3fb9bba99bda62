"""End-to-end parity vs the REFERENCE torch implementation.

Imports the reference's actual ``solve_pose_iteratively`` (train_mono.py)
and ``Compute_Loss`` (losses.py) — with stubs for its unavailable deps —
loads the SAME pose weights into both frameworks via the converter, and
requires matching coupled-solver outputs and loss values on identical
inputs. This is the strongest spot-check that the TPU re-design preserves
the reference's numerical behavior.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# ---- make the reference importable: stub liegroups/torchvision/pyslam ----
if "liegroups" not in sys.modules:
    lie = types.ModuleType("liegroups")
    lie.SE3 = object
    lie.SO3 = object
    sys.modules["liegroups"] = lie
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")
    tvm = types.ModuleType("torchvision.models")
    tvm.resnet18 = None
    tv.transforms = tvt
    tvt.functional = tvf
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.transforms.functional"] = tvf
    sys.modules["torchvision.models"] = tvm

for name in ("pykitti", "cv2", "tensorboardX", "imageio"):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, S, H, W = 2, 2, 32, 64


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def _K():
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    return np.broadcast_to(K, (B, 3, 3)).copy()


@pytest.fixture(scope="module")
def ref_modules():
    try:
        import train_mono as ref_train
        import models.pose_models as ref_pose
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return ref_train, ref_pose


@pytest.fixture(scope="module")
def shared(ref_modules):
    """Same pose net in both frameworks + identical window inputs."""
    ref_train, ref_pose = ref_modules
    from tcsfm.models.pose import PoseNet
    from tcsfm.models.torch_import import convert_pose_state_dict

    torch.manual_seed(0)
    tmodel = ref_pose.pose_model({"flow_type": "none"}).eval()
    params = convert_pose_state_dict(tmodel.state_dict())
    jmodel = PoseNet()

    tgt = _rand((B, H, W, 3), 1)
    srcs = [_rand((B, H, W, 3), 2 + j) for j in range(S)]
    depths = [(_rand((B, H, W, 1), 10 + f) * 1.5 + 0.3).astype(np.float32)
              for f in range(S + 1)]
    return tmodel, jmodel, params, tgt, srcs, depths


class TestCoupledSolverParity:
    @pytest.mark.parametrize("iterations", [1, 3])
    def test_solve_pose_iteratively(self, shared, ref_modules, iterations):
        ref_train, _ = ref_modules
        tmodel, jmodel, params, tgt, srcs, depths = shared

        # ---- reference (torch, NCHW) ----
        t_tgt = torch.from_numpy(tgt).permute(0, 3, 1, 2)
        t_srcs = [torch.from_numpy(s).permute(0, 3, 1, 2) for s in srcs]
        t_depths = [torch.from_numpy(d).permute(0, 3, 1, 2) for d in depths]
        t_K = torch.from_numpy(_K())
        with torch.no_grad():
            t_poses, t_poses_inv = ref_train.solve_pose_iteratively(
                iterations, t_depths, tmodel, t_tgt, t_srcs, t_K)
        t_poses = np.stack([p.numpy() for p in t_poses])

        # ---- ours (jax, NHWC) ----
        from tcsfm.solver.coupled import solve_pose_iteratively

        pose_apply = lambda im: jmodel.apply({"params": params}, im)  # noqa
        j_poses, j_poses_inv = solve_pose_iteratively(
            iterations,
            jnp.stack([jnp.asarray(d) for d in depths]),
            pose_apply, jnp.asarray(tgt),
            jnp.stack([jnp.asarray(s) for s in srcs]),
            jnp.asarray(_K()),
        )
        np.testing.assert_allclose(np.asarray(j_poses), t_poses, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(j_poses_inv),
            np.stack([p.numpy() for p in t_poses_inv]), atol=2e-4)

    def test_loss_stack_parity(self, shared, ref_modules):
        """Full Compute_Loss vs compute_losses on identical inputs."""
        ref_train, _ = ref_modules
        import losses as ref_losses

        from tcsfm.config import Config
        from tcsfm.losses.photometric import compute_losses

        tmodel, jmodel, params, tgt, srcs, depths = shared
        disps = [(_rand((B, H, W, 1), 30 + f) * 0.5 + 0.2).astype(np.float32)
                 for f in range(S + 1)]
        poses = (_rand((S, B, 6), 40) * 0.04 - 0.02).astype(np.float32)
        poses_inv = -poses + (_rand((S, B, 6), 41) * 0.002).astype(np.float32)

        cfg = Config(minibatch=B, num_scales=1, l_depth_consist=True,
                     with_depth_mask=True)
        ref_cfg = {
            "l1_weight": cfg.l1_weight, "l_ssim_weight": cfg.l_ssim_weight,
            "l_smooth_weight": cfg.l_smooth_weight, "num_scales": 1,
            "l_depth_consist_weight": cfg.l_depth_consist_weight,
            "min_depth": cfg.min_depth, "max_depth": cfg.max_depth,
            "l_smooth": True, "l_reconstruction": True, "l_ssim": True,
            "with_auto_mask": True, "l_inverse": True,
            "l_depth_consist": True, "with_depth_mask": True,
        }
        loss_mod = ref_losses.Compute_Loss(ref_cfg)
        t_srcs = [torch.from_numpy(s).permute(0, 3, 1, 2) for s in srcs]
        t_disp = [[torch.from_numpy(d).permute(0, 3, 1, 2)] for d in disps]
        with torch.no_grad():
            t_out = loss_mod(
                t_srcs, torch.from_numpy(tgt).permute(0, 3, 1, 2),
                [[torch.from_numpy(np.asarray(p)) for p in poses],
                 [torch.from_numpy(np.asarray(p)) for p in poses_inv]],
                t_disp, torch.from_numpy(_K()),
            )

        j_out = compute_losses(
            cfg, jnp.asarray(np.stack(srcs)), jnp.asarray(tgt),
            jnp.asarray(poses), jnp.asarray(poses_inv),
            [[jnp.asarray(d)] for d in disps], jnp.asarray(_K()),
        )
        for key in ("l_reconstruct_forward", "l_reconstruct_inverse",
                    "l_depth", "l_smooth", "total"):
            np.testing.assert_allclose(
                float(j_out[key]), float(t_out[key]), atol=3e-5,
                err_msg=key)
