"""MLflow file-store sink: the on-disk layout must match what a stock
mlflow FileStore reads (mlruns/<exp>/<run>/{meta.yaml,metrics,params,tags}
with line-per-point metric files). mlflow itself is not in the image, so
the format assertions here parse the documented layout directly; the
reference surface being mirrored is the MLFlowLogger at
config/no_mips.yaml:18-25 / sotasum/pretrain.py:570-579.
"""

import os


def test_mlflow_file_store_layout(tmp_path):
    from retrieval_augmented_mds_tpu.obs.mlflow import MlflowFileStore

    store = MlflowFileStore(str(tmp_path / "mlruns"), run_name="myrun")
    store.log_params({"train": {"lr": 3e-5, "warmup_steps": 10},
                      "seed": 0})
    for step in range(3):
        store.log_metrics({"loss": 2.0 - step, "rouge1": 0.1 * step,
                           "notes": "skip-me"}, step)
    store.close()

    exp_dir = tmp_path / "mlruns" / "0"
    assert (exp_dir / "meta.yaml").exists()
    exp_meta = (exp_dir / "meta.yaml").read_text()
    assert "lifecycle_stage: active" in exp_meta
    assert "experiment_id: 0" in exp_meta

    run_dir = exp_dir / store.run_id
    run_meta = (run_dir / "meta.yaml").read_text()
    assert f"run_id: {store.run_id}" in run_meta
    assert "status: FINISHED" in run_meta
    assert "end_time: " in run_meta and "end_time: null" not in run_meta

    # metrics: "<timestamp_ms> <value> <step>" per line
    lines = (run_dir / "metrics" / "loss").read_text().strip().splitlines()
    assert len(lines) == 3
    for i, line in enumerate(lines):
        ts, val, step = line.split()
        assert int(ts) > 1_000_000_000_000  # ms epoch
        assert float(val) == 2.0 - i
        assert int(step) == i
    # non-scalar metrics are dropped, not crashed on
    assert not (run_dir / "metrics" / "notes").exists()

    # params: nested config flattened to dotted write-once files
    assert (run_dir / "params" / "train.lr").read_text() == "3e-05"
    assert (run_dir / "params" / "seed").read_text() == "0"
    store.log_param("seed", 99)  # write-once: second write is a no-op
    assert (run_dir / "params" / "seed").read_text() == "0"

    assert (run_dir / "tags" / "mlflow.runName").read_text() == "myrun"


def test_metrics_logger_mlflow_flag(tmp_path):
    from retrieval_augmented_mds_tpu.obs import MetricsLogger

    log = MetricsLogger(str(tmp_path), "run", mlflow=True)
    log.log_hyperparams({"seed": 1, "data": {"batch_size": 4}})
    log.log(0, {"loss": 1.5})
    log.log(1, {"rouge1": 0.2}, prefix="val_")
    log.close()

    exp_dir = tmp_path / "mlruns" / "0"
    runs = [d for d in os.listdir(exp_dir) if (exp_dir / d).is_dir()]
    assert len(runs) == 1
    run_dir = exp_dir / runs[0]
    assert (run_dir / "metrics" / "loss").exists()
    assert (run_dir / "metrics" / "val_rouge1").exists()
    assert (run_dir / "params" / "data.batch_size").read_text() == "4"
    # JSONL primary sink still written
    assert (tmp_path / "run.metrics.jsonl").exists()
