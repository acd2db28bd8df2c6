"""Autoregressive skill-image chaining (reference
``src/image/autoregress/{main,callback}.py``): step i>0 must read ref frames
from step i-1's SaveLastFrame directory. The orchestration is tested with a
stubbed CLI (the real fit/test paths have their own e2e tests)."""

import numpy as np


def test_run_autoregressive_chains_overrides(monkeypatch, tmp_path):
    import main as main_mod
    from motionrag_tpu.image.autoregress import run_autoregressive

    calls = []

    class FakeTrainer:
        def __init__(self):
            self.callbacks = []

        def test(self, model, data, ckpt_path=None):
            return {"step": len(calls)}

    trainers = []

    def fake_cli_main(argv, run=True):
        calls.append(argv)
        t = FakeTrainer()
        trainers.append(t)
        return object(), object(), t, None

    monkeypatch.setattr(main_mod, "cli_main", fake_cli_main)

    results = run_autoregressive(
        "cfg.yml", num_steps=3, work_dir=str(tmp_path),
        overrides_per_step=[["--a=1"], [], ["--b=2"]],
    )
    assert len(results) == 3
    assert len(calls) == 3

    # step 0: no ref-frame handoff, per-step override + llm_plan forced
    assert "--a=1" in calls[0]
    assert "--data.prompt_type=llm_plan" in calls[0]
    assert not any("use_ref_frame" in a for a in calls[0])

    # steps 1..n read the previous step's SaveLastFrame dir
    for i in (1, 2):
        assert "--data.use_ref_frame=true" in calls[i]
        ref = [a for a in calls[i] if a.startswith("--data.ref_frame_dir=")]
        assert ref and f"step_{i-1:02d}_frames" in ref[0]
    assert "--b=2" in calls[2]

    # each step got a SaveLastFrame callback aimed at its own frame dir
    from motionrag_tpu.training.callbacks import SaveLastFrame

    for i, t in enumerate(trainers):
        cbs = [c for c in t.callbacks if isinstance(c, SaveLastFrame)]
        assert len(cbs) == 1
        assert f"step_{i:02d}_frames" in str(cbs[0].save_dir)


def test_save_last_frame_callback(tmp_path):
    """SaveLastFrame writes step i's final generated frame keyed by sample
    id — the handoff file the dataset's use_ref_frame path waits on."""
    from motionrag_tpu.training.callbacks import SaveLastFrame

    cb = SaveLastFrame(save_dir=str(tmp_path))
    videos = [np.random.default_rng(0).integers(0, 255, (1, 4, 3, 8, 8), dtype=np.uint8)]
    out = cb.on_eval_epoch_end(None, "test", videos, videos, ["p"], sample_ids=["vid7"])
    files = list(tmp_path.glob("*"))
    assert files, "no handoff frame written"
