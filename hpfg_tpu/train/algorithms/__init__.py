"""Training algorithms.

Each reference entry script (main.py, 2017_03_…, 2021_06_…, …) becomes an
Algorithm class whose `step` is ONE pure jittable function: student and
teacher forwards, every loss term, both optimizer updates and the EMA updates
execute in a single XLA program per iteration.
"""

from hpfg_tpu.registry import Registry

ALGORITHMS = Registry("algorithm")


_MODULES = ("supervised", "mean_teacher", "uamt", "cps", "ctct", "ict",
            "ssnet", "s4cvnet", "hpfg", "swin_mae")


def _register_all():
    import importlib

    for mod in _MODULES:
        try:
            importlib.import_module(f"hpfg_tpu.train.algorithms.{mod}")
        except ModuleNotFoundError as exc:
            if exc.name != f"hpfg_tpu.train.algorithms.{mod}":
                raise


def build_algorithm(name: str, cfg, **kwargs):
    _register_all()
    return ALGORITHMS.get(name)(cfg, **kwargs)
