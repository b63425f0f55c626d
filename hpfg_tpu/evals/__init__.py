from hpfg_tpu.evals.metrics import (  # noqa: F401
    AverageMeter,
    MedicalMetric,
    SegMetrics,
    binary_asd,
    binary_dice,
    binary_hd95,
    binary_jaccard,
    calculate_metric_percase,
)
