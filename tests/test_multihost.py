"""Multi-host (DCN) bootstrap: a REAL 2-process JAX cluster on CPU.

The reference trains with Lightning DDP over NCCL on 8 GPUs
(``configs/cogvideox/MotionRAG_open.yml:5-7``); the TPU-native equivalent is
``jax.distributed.initialize`` + a host-aware global mesh (SURVEY §2.9).
This test spawns two OS processes, each with 4 virtual CPU devices, boots
the distributed runtime through ``parallel.distributed.initialize_distributed``
(env-var path, same as production), builds the global dp=8 mesh through the
real ``Trainer``, feeds each process its half of a deterministic global
batch, and runs real ``Trainer.fit`` steps — the final loss must equal the
single-process value on the full batch (loss is nonlinear in the batch, so
wrong sharding/averaging would show).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent("""
    import json
    import os
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from motionrag_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()  # MRT_COORDINATOR / MRT_NUM_PROCESSES / MRT_PROCESS_ID
    assert jax.process_count() == 2, jax.process_count()

    import jax.numpy as jnp

    from motionrag_tpu.parallel.mesh import MeshConfig
    from motionrag_tpu.training.trainer import Trainer


    class Module:
        # loss nonlinear in the batch: mean over the GLOBAL batch of
        # (w . g_i)^2 — a mis-sharded or locally-averaged batch gives a
        # different value
        full_trainable_modules = ("w",)
        trainable_patterns = ("w",)

        def init_params(self, rng, batch):
            return {"w": {"params": {"kernel": jnp.ones((4,), jnp.float32) * 0.5}}}

        def loss(self, params, batch, rng):
            w = params["w"]["params"]["kernel"]
            y = jnp.sum(batch["g"] * w, axis=-1)
            loss = jnp.mean(y ** 2)
            return loss, {"main_loss": loss}


    class Data:
        # global batch: rows 0..7 of a deterministic matrix; this process
        # contributes rows [4*pid, 4*pid+4) (DDP per-process slice contract)
        def __init__(self):
            g = (np.arange(32, dtype=np.float32).reshape(8, 4) / 7.0) - 1.0
            pid = jax.process_index()
            self.batch = {"g": g[4 * pid: 4 * pid + 4]}

        def prepare_data(self):
            pass

        def setup(self, stage):
            pass

        def train_dataloader(self):
            return [self.batch] * 3

        def val_dataloader(self):
            return []


    trainer = Trainer(
        max_steps=3, log_every_n_steps=100, val_check_interval=0,
        checkpoint_every_n_steps=0, num_sanity_val_steps=0,
        default_root_dir=os.environ["MRT_TEST_DIR"] + f"/p{jax.process_index()}",
        mesh_config=MeshConfig(dp=-1),
        optimizer_config={"learning_rate": 0.1},
    )
    module = Module()
    state = trainer.fit(module, Data())
    # final loss on the (globally sharded) batch after 3 steps
    batch = trainer._shard_batch(Data().batch)
    loss = float(jax.device_get(jax.jit(
        lambda p, b: module.loss(p, b, jax.random.key(0))[0])(state.params, batch)))
    w = np.asarray(jax.device_get(state.params["w"]["params"]["kernel"]))
    print("RESULT " + json.dumps({
        "pid": jax.process_index(),
        "mesh": dict(trainer.mesh.shape),
        "loss": loss,
        "w": w.tolist(),
    }), flush=True)
""")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cpu_cluster_loss_equivalence(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    port = _free_port()

    procs = []
    for pid in (0, 1):
        env = dict(
            os.environ,
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            MRT_COORDINATOR=f"127.0.0.1:{port}",
            MRT_NUM_PROCESSES="2",
            MRT_PROCESS_ID=str(pid),
            MRT_TEST_DIR=str(tmp_path),
            JAX_PLATFORMS="",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    results = {}
    for pid, proc in enumerate(procs):
        out, err = proc.communicate(timeout=600)
        assert proc.returncode == 0, f"worker {pid} failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results[pid] = json.loads(line[len("RESULT "):])

    # global mesh really spanned both hosts
    assert results[0]["mesh"]["dp"] == 8
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert np.allclose(results[0]["w"], results[1]["w"], rtol=1e-6)

    # single-process reference: the SAME Trainer on the FULL global batch
    # (8 virtual devices, dp=8, one process)
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        MRT_TEST_DIR=str(tmp_path),
        JAX_PLATFORMS="",
    )
    env.pop("MRT_COORDINATOR", None)
    single_py = tmp_path / "single.py"
    single_py.write_text(
        WORKER
        .replace('initialize_distributed()  # MRT_COORDINATOR / MRT_NUM_PROCESSES / MRT_PROCESS_ID',
                 'pass')
        .replace('assert jax.process_count() == 2, jax.process_count()', '')
        .replace('self.batch = {"g": g[4 * pid: 4 * pid + 4]}',
                 'self.batch = {"g": g}')
    )
    proc = subprocess.run([sys.executable, str(single_py)], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")][-1]
    ref = json.loads(line[len("RESULT "):])

    assert results[0]["loss"] == pytest.approx(ref["loss"], rel=1e-5)
    assert np.allclose(results[0]["w"], ref["w"], rtol=1e-5, atol=1e-6)
