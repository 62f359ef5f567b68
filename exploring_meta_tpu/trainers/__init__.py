"""Training loops behind the CLI entry points in scripts/."""

from exploring_meta_tpu.trainers.vision import VisionTrainer

__all__ = ["VisionTrainer"]
