"""COBRA task configs (reference configs/cobra/__init__.py:18-24)."""

from spriteworld_tpu.configs.cobra import clustering
from spriteworld_tpu.configs.cobra import common
from spriteworld_tpu.configs.cobra import exploration
from spriteworld_tpu.configs.cobra import goal_finding_more_distractors
from spriteworld_tpu.configs.cobra import goal_finding_more_targets
from spriteworld_tpu.configs.cobra import goal_finding_new_position
from spriteworld_tpu.configs.cobra import goal_finding_new_shape
from spriteworld_tpu.configs.cobra import sorting
