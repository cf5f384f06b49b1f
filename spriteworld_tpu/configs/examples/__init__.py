"""Example task configs (reference configs/examples/__init__.py:18-19)."""

from spriteworld_tpu.configs.examples import goal_finding_clustering
from spriteworld_tpu.configs.examples import goal_finding_embodied
