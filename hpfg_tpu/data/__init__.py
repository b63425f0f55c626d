from hpfg_tpu.data.builder import build_loader  # noqa: F401
