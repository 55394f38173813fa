"""Multi-host (DCN) readiness: per-process batch slicing math, the
global-array assembly path, and a REAL 2-process jax.distributed run on
CPU (each subprocess gets 4 forced host devices -> an 8-device global
mesh; SURVEY.md §5.8)."""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from item_alignment_tpu.parallel.sharding import process_slice, put_global_batch
from item_alignment_tpu.parallel.mesh import create_mesh
from item_alignment_tpu.config import MeshConfig


def test_process_slice_partitions_batch():
    n = 16
    seen = []
    for pi in range(4):
        sl = process_slice(n, process_index=pi, process_count=4)
        seen.extend(range(n)[sl])
    assert seen == list(range(n))  # disjoint, ordered, complete


def test_process_slice_requires_divisibility():
    with pytest.raises(AssertionError):
        process_slice(10, process_index=0, process_count=4)


def test_put_global_batch_single_process():
    from item_alignment_tpu.parallel.sharding import batch_sharding

    mesh = create_mesh(MeshConfig(data=-1))
    x = np.arange(32, dtype=np.float32).reshape(16, 2)
    arr = put_global_batch(batch_sharding(mesh), x)
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert arr.sharding.spec == jax.sharding.PartitionSpec("data")


_WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 8, jax.device_count()

    sys.path.insert(0, %(repo)r)
    from item_alignment_tpu.config import (MeshConfig, ModelConfig,
                                           OptimizerConfig, TrainConfig)
    from item_alignment_tpu.data.datasets import ArrayDataset
    from item_alignment_tpu.engine.train import Trainer
    from item_alignment_tpu.models.text import TextCNNTwoTower

    cfg = ModelConfig.textcnn(hidden_size=16, num_hidden_layers=1,
                              num_attention_heads=4, vocab_size=50,
                              max_position_embeddings=64, num_filters=4,
                              hidden_dropout_prob=0.0)
    rs = np.random.RandomState(0)  # same data on every host
    a = rs.randint(5, 50, (32, 8)).astype(np.int32)
    b = a.copy(); neg = rs.rand(32) < 0.5
    b[neg] = rs.randint(5, 50, (int(neg.sum()), 8))
    ds = ArrayDataset({"input_ids_1": a, "input_ids_2": b,
                       "labels": (~neg).astype(np.int32)})
    tcfg = TrainConfig(train_batch_size=16, eval_batch_size=16, num_epochs=2,
                       log_steps=100, mesh=MeshConfig(data=-1),
                       optimizer=OptimizerConfig(learning_rate=1e-3,
                                                 total_steps=4))
    t = Trainer(TextCNNTwoTower(cfg), tcfg)
    res = t.fit(ds, ds)
    print("RESULT", json.dumps({"pid": pid,
                                "loss": res["history"][-1]["loss"],
                                "f1": res["best"]["best_f1"]}))
""")


@pytest.mark.skipif(os.environ.get("IA_TPU_TESTS") == "1",
                    reason="CPU-only multiprocess test")
def test_two_process_distributed_training(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))})
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
    # both hosts computed the SAME global step sequence (data-parallel
    # consistency across processes)
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-5)
    assert results[0]["f1"] == pytest.approx(results[1]["f1"], rel=1e-6)
