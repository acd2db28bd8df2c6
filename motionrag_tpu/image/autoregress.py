"""Autoregressive skill-image evaluation: chain generation steps so each
step's last generated frame becomes the next step's reference frame
(reference ``src/image/autoregress/{main,callback}.py`` + the SaveLastFrame
ref-frame handoff with the dataset's wait-for-file loop,
``dataset.py:264-279``).

Instead of re-invoking ``main.py`` per step as the reference does, the chain
runs in-process: one trainer/test per step with ``--data`` overrides, with
the SaveLastFrame callback writing the handoff frames.
"""

from __future__ import annotations

from pathlib import Path

__all__ = ["run_autoregressive"]


def run_autoregressive(
    config_path: str,
    num_steps: int,
    work_dir: str = "outputs/autoregress",
    overrides_per_step: list[list[str]] | None = None,
):
    """Run ``num_steps`` chained test evaluations. Step i>0 reads ref frames
    from step i-1's SaveLastFrame directory."""
    from main import cli_main
    from motionrag_tpu.training.callbacks import SaveLastFrame

    work = Path(work_dir)
    results = []
    for step in range(num_steps):
        frame_dir = work / f"step_{step:02d}_frames"
        overrides = list((overrides_per_step or [[]] * num_steps)[step])
        overrides += [f"--data.prompt_type=llm_plan"]
        if step > 0:
            overrides += [
                "--data.use_ref_frame=true",
                f"--data.ref_frame_dir={work / f'step_{step - 1:02d}_frames'}",
            ]
        model, data, trainer, ckpt = cli_main(
            ["test", "-c", config_path, *overrides], run=False
        )
        trainer.callbacks.append(SaveLastFrame(save_dir=str(frame_dir)))
        out = trainer.test(model, data, ckpt_path=ckpt)
        results.append(out)
    return results
