"""Real-checkpoint parity (tools/verify_hf_parity.py) as a test.

Skips unless the HF cache already holds the reference's checkpoints
(this container has zero egress); the first networked session runs it
for real and commits artifacts/hf_parity.json.
"""

import os
import sys

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "tools")
)


def _cached(name: str) -> bool:
    try:
        from transformers import AutoConfig

        AutoConfig.from_pretrained(name, local_files_only=True)
        return True
    except Exception:  # noqa: BLE001
        return False


@pytest.mark.slow
@pytest.mark.parametrize(
    "key,name",
    [
        ("led", "allenai/led-base-16384"),
        ("specter2", "allenai/specter2_base"),
        ("longformer", "allenai/longformer-base-4096"),
    ],
)
def test_real_checkpoint_parity(key, name, tmp_path):
    if not _cached(name):
        pytest.skip(f"{name} not in HF cache (zero-egress container)")
    import verify_hf_parity as v

    rc = v.main(["--models", key, "--out", str(tmp_path / "parity.json")])
    assert rc == 0
