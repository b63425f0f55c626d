"""hpfg_tpu — a TPU-native semi-supervised medical image segmentation framework.

A ground-up JAX / Flax / optax / Pallas rebuild of the capability surface of the
HPFG reference framework (semi-supervised learning for medical image
segmentation): dataset loaders (ACDC / LIDC / ISIC / Synapse / Building), a 2-D
segmentation model zoo (CNN + transformer), eight SSL training algorithms
(Mean-Teacher, UAMT, CPS, CTCT, ICT, SS-Net, S4CVNet, HPFG), a Swin-MAE
self-supervised pretrainer, and a shared loss / schedule / metric / config /
logging substrate.

Design principles (TPU-first, not a port):
  * NHWC layouts, bfloat16 compute with float32 parameters/statistics.
  * Each training algorithm is ONE jitted `train_step(state, batch, rng)`
    function: both students, the EMA teacher, all losses, optimizer updates and
    EMA updates execute in a single XLA program with parameters resident in HBM.
  * Data parallelism via `jax.sharding.Mesh` + NamedSharding (GSPMD); batch
    statistics and contrastive terms become global automatically under jit.
  * Evaluation batches volume slices on device; only HD95's distance transforms
    run on host.
  * Hot non-matmul ops (window attention, on-device augmentation) have Pallas
    TPU kernels.
"""

__version__ = "0.1.0"

from hpfg_tpu.config import Config, load_config  # noqa: F401
