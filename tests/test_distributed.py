"""Multi-process jax.distributed bring-up (SURVEY §4 item 4, §5.8):
two real OS processes on the CPU backend form a process group through
``initialize_distributed`` and run one cross-process psum. Also: the CLI
end-to-end with mesh flags on the virtual 8-device mesh (VERDICT item 5).
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")

from relgat_projector_tpu.parallel import initialize_distributed, is_primary

coord, rank = sys.argv[1], int(sys.argv[2])
got_rank = initialize_distributed(
    coordinator_address=coord, num_processes=2, process_id=rank
)
assert got_rank == rank, (got_rank, rank)
assert jax.device_count() == 2, jax.device_count()
assert jax.local_device_count() == 1
assert is_primary() == (rank == 0)

import jax.numpy as jnp

# One cross-process collective: psum over the 2-device global axis.
out = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
    jnp.ones((1,)) * (rank + 1.0)
)
total = float(out[0])
assert total == 3.0, total
print(f"RANK{rank}_OK total={total}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(rank)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}_OK total=3.0" in out, out


def test_cli_with_mesh_flags_end_to_end(tmp_path):
    """`relgat-projector-train --mesh-data 4 --mesh-graph 2` trains on the
    virtual mesh (previously MeshConfig was unreachable from the CLI)."""
    import jax

    assert len(jax.devices()) >= 8
    from relgat_projector_tpu import cli

    out_dir = str(tmp_path / "ckpt")
    cli.main([
        "--synthetic", "--synthetic-nodes", "200", "--synthetic-edges",
        "1500", "--synthetic-rels", "4", "--synthetic-dim", "16",
        "--epochs", "1", "--batch-size", "64", "--num-neg", "4",
        "--gat-out-dim", "8", "--heads", "2", "--gat-num-layers", "1",
        "--project-to-input-size", "--projection-layers", "1",
        "--lr", "1e-3", "--lr-scheduler", "constant",
        "--mesh-data", "4", "--mesh-graph", "2",
        "--save-dir", out_dir, "--log-every-n-steps", "1000",
    ])
    saved = os.listdir(out_dir)
    assert any("relgat" in d for d in saved), saved
    # And the Pallas + halo combination through the CLI as well.
    out_dir2 = str(tmp_path / "ckpt2")
    cli.main([
        "--synthetic", "--synthetic-nodes", "200", "--synthetic-edges",
        "1500", "--synthetic-rels", "4", "--synthetic-dim", "16",
        "--epochs", "1", "--batch-size", "64", "--num-neg", "4",
        "--gat-out-dim", "8", "--heads", "2", "--gat-num-layers", "1",
        "--project-to-input-size", "--projection-layers", "1",
        "--lr", "1e-3", "--lr-scheduler", "constant", "--use-pallas",
        "--mesh-data", "2", "--mesh-graph", "4",
        "--save-dir", out_dir2, "--log-every-n-steps", "1000",
    ])
    assert any("relgat" in d for d in os.listdir(out_dir2))


def test_mesh_config_reaches_trainer_from_cli_args():
    from relgat_projector_tpu import cli

    args = cli.get_args([
        "--synthetic", "--mesh-data", "2", "--mesh-graph", "4",
        "--mesh-propagate", "replicated",
    ])
    run = cli.build_run_config(args)
    assert run.mesh.data_axis == 2
    assert run.mesh.graph_axis == 4
    assert run.mesh.num_devices == 8
    assert run.model.mesh_propagate == "replicated"


_HALO_WORKER = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from relgat_projector_tpu.parallel import initialize_distributed

coord, rank = sys.argv[1], int(sys.argv[2])
initialize_distributed(coordinator_address=coord, num_processes=2,
                       process_id=rank)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import jax.numpy as jnp
from relgat_projector_tpu.ops.relgat_ops import relgat_propagate
from relgat_projector_tpu.parallel import make_mesh
from relgat_projector_tpu.parallel.halo import build_halo_graph, halo_propagate

# Deterministic problem on every process.
rng = np.random.default_rng(0)
n, e, r, heads, f = 300, 2000, 5, 2, 8
src = rng.integers(0, n, e).astype(np.int32)
dst = rng.integers(0, n, e).astype(np.int32)
et = rng.integers(0, r, e).astype(np.int32)
attn = jnp.asarray((rng.standard_normal((heads, r, f)) * 0.3).astype(np.float32))
bias = jnp.asarray((rng.standard_normal(r) * 0.1).astype(np.float32))

# graph axis = 8 spans BOTH processes: the all_to_all halo exchange crosses
# the process boundary (DCN analog), not just local devices.
mesh = make_mesh(data=1, graph=8)
hg = build_halo_graph(src, dst, et, n, 8).with_mesh(mesh)
h = jnp.asarray(rng.standard_normal((hg.num_nodes, heads, f)).astype(np.float32))

got = halo_propagate(h, attn, bias, hg)
want = np.asarray(relgat_propagate(
    h, attn, bias, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(et),
    num_nodes=hg.num_nodes,
))
# The output spans both processes; every process checks ITS addressable
# shards against the single-device reference.
checked = 0
for shard in got.addressable_shards:
    np.testing.assert_allclose(
        np.asarray(shard.data), want[shard.index], rtol=1e-4, atol=1e-5
    )
    checked += 1
assert checked >= 4, checked
print(f"RANK{rank}_HALO_OK shards={checked}")
"""


def test_two_process_halo_exchange():
    """The boundary-only halo all_to_all must work across a REAL process
    boundary (multi-host semantics, SURVEY §5.8): 2 OS processes x 4 CPU
    devices, graph axis of 8 spanning both."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _HALO_WORKER, coord, str(rank)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for rank in range(2)
    ]
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}_HALO_OK" in out, out


_TRAINER_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")

from relgat_projector_tpu.parallel import initialize_distributed

coord, rank, phase, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
use_pallas = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
initialize_distributed(coordinator_address=coord, num_processes=2,
                       process_id=rank)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import numpy as np
from relgat_projector_tpu.config import (
    MeshConfig, ModelConfig, RunConfig, TrainConfig,
)
from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
from relgat_projector_tpu.train.trainer import RelGATTrainer

node2emb, rel2idx, triplets = generate_synthetic_kg(
    num_nodes=160, num_edges=1600, num_rel=4, emb_dim=16, seed=0
)
run = RunConfig(
    model=ModelConfig(
        in_dim=16, num_rel=4, gat_out_dim=8, gat_heads=2,
        gat_num_layers=2, dropout=0.0, project_to_input_size=True,
        projection_layers=1, use_pallas=use_pallas,
        mesh_propagate="halo",
        # Pinned small blocks: interpret-mode Pallas on CPU, and byte-
        # identical layouts to the single-process ground truth.
        block_nodes=64 if use_pallas else 0,
        chunk_edges=128 if use_pallas else 0,
    ),
    train=TrainConfig(
        epochs=1, train_batch_size=64, eval_batch_size=64, num_neg=4,
        lr=1e-3, lr_scheduler="constant", warmup_steps=0,
        eval_ks_ranks=(1, 2), seed=3, log_every_n_steps=10_000,
        out_dir=out_dir,
    ),
    mesh=MeshConfig(data_axis=1, graph_axis=8),
)
trainer = RelGATTrainer(run, node2emb, rel2idx, triplets,
                        log_to_console=False)
assert trainer._multiprocess and trainer._is_primary == (rank == 0)
# Per-process shard construction: the full [N, D] feature matrix was NEVER
# stacked host-side; only this process's addressable graph-shard rows were.
assert trainer.dataset.node_emb is None
rows = trainer.dataset.features_materialized_rows
# Each process materializes only its ADDRESSABLE half of the (padded)
# global feature matrix — rows counts padding rows too, so bound against
# the graph's padded node count, not the raw dataset N (the Pallas
# blocked layout pads nodes to block multiples).
padded = int(trainer.graph.num_nodes)
assert 0 < rows <= padded // 2, (rows, padded, trainer.dataset.num_nodes)

# Count actual storage writes to prove single-writer gating.
writes = []
_orig = trainer.storage.save_checkpoint
trainer.storage.save_checkpoint = (
    lambda *a, **k: (writes.append(1), _orig(*a, **k))[1]
)

if phase == "resume":
    assert trainer.maybe_resume(), "no resumable checkpoint found"
    assert trainer.global_step > 0

trainer.train(epochs=1)
assert (len(writes) > 0) == (rank == 0), (rank, writes)

mrr, hits, loss, *_ = trainer.evaluate()
fp = float(sum(
    np.abs(np.asarray(l)).sum()
    for l in jax.tree_util.tree_leaves(trainer.state.params)
))
print(f"RANK{rank}_TRAIN_OK phase={phase} step={trainer.global_step} "
      f"mrr={mrr:.6f} loss={loss:.6f} fp={fp:.5f} rows={rows}")
"""


def _run_trainer_pair(phase: str, out_dir: str, use_pallas: bool = False) -> str:
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _TRAINER_WORKER, coord, str(rank),
             phase, out_dir, str(int(use_pallas))],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}_TRAIN_OK phase={phase}" in out, out
    return outs[0]


def _parse_result(out: str, phase: str) -> dict:
    line = next(
        ln for ln in out.splitlines() if f"TRAIN_OK phase={phase}" in ln
    )
    kv = dict(tok.split("=") for tok in line.split()[1:])
    return {k: float(v) for k, v in kv.items() if k != "phase"}


def _single_process_ground_truth(out_dir: str, use_pallas: bool) -> dict:
    """Identical config on the local 8-device mesh, same train ->
    final-save -> fresh-trainer-resume -> train sequence as the 2-process
    pair; returns the same summary fields."""
    import numpy as np

    from relgat_projector_tpu.config import (
        MeshConfig, ModelConfig, RunConfig, TrainConfig,
    )
    from relgat_projector_tpu.data.synthetic import generate_synthetic_kg
    from relgat_projector_tpu.train.trainer import RelGATTrainer

    node2emb, rel2idx, triplets = generate_synthetic_kg(
        num_nodes=160, num_edges=1600, num_rel=4, emb_dim=16, seed=0
    )

    def build():
        run = RunConfig(
            model=ModelConfig(
                in_dim=16, num_rel=4, gat_out_dim=8, gat_heads=2,
                gat_num_layers=2, dropout=0.0, project_to_input_size=True,
                projection_layers=1, use_pallas=use_pallas,
                mesh_propagate="halo",
                block_nodes=64 if use_pallas else 0,
                chunk_edges=128 if use_pallas else 0,
            ),
            train=TrainConfig(
                epochs=1, train_batch_size=64, eval_batch_size=64,
                num_neg=4, lr=1e-3, lr_scheduler="constant",
                warmup_steps=0, eval_ks_ranks=(1, 2), seed=3,
                log_every_n_steps=10_000,
                out_dir=out_dir,
            ),
            mesh=MeshConfig(data_axis=1, graph_axis=8),
        )
        return RelGATTrainer(
            run, node2emb, rel2idx, triplets, log_to_console=False
        )

    t = build()
    t.train(epochs=1)
    t2 = build()
    assert t2.maybe_resume()
    t2.train(epochs=1)
    mrr, hits, loss, *_ = t2.evaluate()
    fp = float(sum(
        np.abs(np.asarray(l)).sum()
        for l in __import__("jax").tree_util.tree_leaves(t2.state.params)
    ))
    return {"mrr": mrr, "loss": loss, "fp": fp}


def test_two_process_trainer_end_to_end(tmp_path):
    """VERDICT r3 #1: `RelGATTrainer` as 2 real OS processes — train ->
    checkpoint -> (processes die) -> resume in FRESH processes -> finish —
    matching the single-process trainer's numerics, with each process
    materializing only its feature shards (never the full [N, D] matrix)."""
    out_dir = str(tmp_path / "mp-ckpt")

    got_a = _parse_result(_run_trainer_pair("fresh", out_dir), "fresh")
    # The first pair exited; a brand-new pair resumes from its checkpoint.
    got_b = _parse_result(_run_trainer_pair("resume", out_dir), "resume")
    assert got_b["step"] > got_a["step"]

    want = _single_process_ground_truth(str(tmp_path / "sp-ckpt"), False)
    np.testing.assert_allclose(got_b["loss"], want["loss"], rtol=1e-4)
    np.testing.assert_allclose(got_b["mrr"], want["mrr"], rtol=1e-3)
    np.testing.assert_allclose(got_b["fp"], want["fp"], rtol=1e-4)


def test_two_process_trainer_pallas_halo(tmp_path):
    """VERDICT r4 missing #3 — the multi-process x Pallas diagonal: the
    2-process trainer with `use_pallas=True` (interpret mode on CPU) over
    the halo mesh — per-process blocked-layout construction, sharded node
    features, checkpoint -> kill -> resume — matching single-process
    Pallas numerics. Previously Pallas x halo was covered single-process
    only and cross-process runs were XLA-only."""
    out_dir = str(tmp_path / "mp-pallas-ckpt")

    got_a = _parse_result(
        _run_trainer_pair("fresh", out_dir, use_pallas=True), "fresh"
    )
    got_b = _parse_result(
        _run_trainer_pair("resume", out_dir, use_pallas=True), "resume"
    )
    assert got_b["step"] > got_a["step"]

    want = _single_process_ground_truth(
        str(tmp_path / "sp-pallas-ckpt"), True
    )
    np.testing.assert_allclose(got_b["loss"], want["loss"], rtol=1e-4)
    np.testing.assert_allclose(got_b["mrr"], want["mrr"], rtol=1e-3)
    np.testing.assert_allclose(got_b["fp"], want["fp"], rtol=1e-4)
