"""Sustained TPU soaks (gitignored): 1500 iters per algorithm on synthetic
ACDC @224² with periodic eval — dice curves, not 20-iter smokes. One
algorithm per invocation (ONE TPU job at a time):

    python _soak_run.py mean_teacher|cps|ict|ctct|s4cvnet|ssnet|uamt
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_default_prng_impl", "rbg")

from hpfg_tpu.config import Config
from hpfg_tpu.data.synthetic import make_synthetic_acdc
from hpfg_tpu.train.algorithms import build_algorithm
from hpfg_tpu.train.trainer import Trainer
from tests.helpers import tiny_model_block  # reuse nested-block builder

ALGO = sys.argv[1] if len(sys.argv) > 1 else "cps"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 1500

ROOT = os.path.join(os.path.dirname(__file__), ".data", "soak_acdc")
if not os.path.isdir(os.path.join(ROOT, "data")):
    make_synthetic_acdc(ROOT, n_train_slices=160, n_test_volumes=3)


def model_block(model="unet_plus"):
    return dict(model=model, in_channels=1, num_classes=4,
                opt="sgd", lr=0.01, weight_decay=1e-4, momentum=0.9,
                sched="medical", total_itrs=ITERS, step_size=500,
                train_crop_size=[224, 224])


base = dict(
    datasets="acdc", num_classes=4, in_channels=1, data_path=ROOT,
    train_crop_size=[224, 224], test_crop_size=[224, 224],
    batch_size=8, unlabel_batch_size=16, label_num=0.2,
    consistency=0.1, consistency_rampup=200.0, ema_decay=0.99,
    model="unet", seed=0, total_itrs=ITERS, step_size=500,
    opt="sgd", lr=0.01, weight_decay=1e-4, momentum=0.9,
    sched="medical", warmup_epochs=0, warmup_lr=1e-4, min_lr=1e-6,
    device_augment=True, prefetch=2,
    save_path=f"checkpoint/soak_{ALGO}",
)
if ALGO in ("cps", "ict", "s4cvnet", "ctct", "hpfg"):
    base["model1"] = model_block("unet" if ALGO != "hpfg" else "unet_plus")
    base["model2"] = model_block(
        {"cps": "unet", "ict": "unet", "hpfg": "unet_plus",
         "s4cvnet": "swinunet", "ctct": "segformer"}[ALGO])
if ALGO == "ssnet":
    base["model"] = "ssnet"

cfg = Config(base)
algo = build_algorithm(ALGO, cfg, dtype=jnp.bfloat16)
trainer = Trainer(cfg, algo, enable_tb=False, log_every=50)
t0 = time.time()
state = trainer.fit()
wall = time.time() - t0
result = {
    "algo": ALGO, "iters": ITERS, "wall_s": round(wall, 1),
    "dice": {k: round(v[0], 4)
             for k, v in trainer.history[-1]["results"].items()}
    if trainer.history else {},
}
print("SOAK " + json.dumps(result), flush=True)
