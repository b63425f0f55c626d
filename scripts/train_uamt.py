"""Entry script (reference counterpart: 2019_07_MICCAI_Uncertainty_Aware_ACDC.py)."""

from run import run

if __name__ == "__main__":
    run("configs/uncertainty_aware_unet_30k_224x224_ACDC.yaml")
