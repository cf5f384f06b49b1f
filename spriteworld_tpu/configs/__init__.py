"""Task configs: declarative `get_config(mode) -> Environment kwargs` modules.

Same protocol as the reference (`importlib.import_module(path).get_config`,
run_demo.py:49-50): every module exposes ``get_config(mode)`` returning a
dict whose keys match ``core.environment.Environment.__init__``.
"""

from spriteworld_tpu.configs import cobra
from spriteworld_tpu.configs import examples
