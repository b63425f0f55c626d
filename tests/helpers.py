"""Shared test helpers: tiny configs over the synthetic ACDC tree."""

from hpfg_tpu.config import Config

TINY_CHNS = [4, 8, 16, 32, 64]
TINY_DROPOUT = [0.05, 0.1, 0.2, 0.3, 0.5]


def tiny_cfg(data_path: str, **overrides) -> Config:
    base = dict(
        datasets="acdc",
        num_classes=4,
        data_path=data_path,
        name="test",
        train_crop_size=[32, 32],
        test_crop_size=[32, 32],
        batch_size=4,
        unlabel_batch_size=8,
        label_num=0.4,
        consistency=0.1,
        consistency_rampup=200.0,
        ema_decay=0.99,
        model="unet",
        in_channels=1,
        feature_chns=TINY_CHNS,
        dropout=TINY_DROPOUT,
        seed=0,
        total_itrs=20,
        step_size=10,
        opt="sgd",
        lr=0.05,
        weight_decay=1e-4,
        momentum=0.9,
        sched="medical",
        warmup_epochs=0,
        warmup_lr=1e-4,
        min_lr=1e-6,
    )
    base.update(overrides)
    return Config(base)


def tiny_model_block(**overrides) -> dict:
    block = dict(
        model="unet_plus", in_channels=1, num_classes=4,
        feature_chns=TINY_CHNS, dropout=TINY_DROPOUT,
        opt="sgd", lr=0.05, weight_decay=1e-4, momentum=0.9,
        sched="medical", warmup_epochs=0, warmup_lr=1e-4, min_lr=1e-6,
        total_itrs=20, step_size=10, train_crop_size=[32, 32],
    )
    block.update(overrides)
    return block
