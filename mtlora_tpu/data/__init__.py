"""Data pipelines: PASCAL-Context / NYUD multi-task datasets, transforms,
task configuration, and host->device feeding."""

from mtlora_tpu.data.task_config import get_tasks_config  # noqa: F401
