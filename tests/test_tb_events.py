"""TensorBoard event emitter: files must be readable by TensorBoard itself.

The dependency-free writer (obs/tb.py) hand-encodes Event protobufs +
TFRecord CRC32C framing; this validates against the REAL TensorBoard
reader (EventAccumulator), which checks CRCs and decodes protos — any
framing or wire-format mistake fails loudly here.
"""

import numpy as np
import pytest


def test_events_readable_by_tensorboard(tmp_path):
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator"
    )
    from retrieval_augmented_mds_tpu.obs.tb import TBEventWriter

    w = TBEventWriter(str(tmp_path))
    for step in range(5):
        w.add_scalars(step, {"loss": 2.0 - 0.1 * step, "lr": 1e-4 * step})
    w.add_scalars(5, {"loss": float(np.float32(1.23)), "skipme": "a string"})
    w.close()

    acc = ea_mod.EventAccumulator(str(tmp_path))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert tags == {"loss", "lr"}  # the non-numeric value was dropped
    loss = acc.Scalars("loss")
    assert [e.step for e in loss] == [0, 1, 2, 3, 4, 5]
    np.testing.assert_allclose(loss[0].value, 2.0, rtol=1e-6)
    np.testing.assert_allclose(loss[-1].value, 1.23, rtol=1e-6)
    lr = acc.Scalars("lr")
    np.testing.assert_allclose(lr[3].value, 3e-4, rtol=1e-6)


def test_metrics_logger_tensorboard_flag(tmp_path):
    pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator"
    )
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    from retrieval_augmented_mds_tpu.obs import MetricsLogger

    log = MetricsLogger(str(tmp_path), "run", tensorboard=True)
    log.log(0, {"loss": 3.0})
    log.log(1, {"loss": 2.5}, prefix="val_")
    log.close()

    acc = EventAccumulator(str(tmp_path / "tb" / "run"))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert tags == {"loss", "val_loss"}
