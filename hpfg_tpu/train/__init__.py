from hpfg_tpu.train.optim import build_lr_schedule, build_optimizer  # noqa: F401
