"""Entry script (reference counterpart: 2022_03_MICCAI_SS-Net_ACDC.py)."""

from run import run

if __name__ == "__main__":
    run("configs/ssnet_unet_30k_224x224_ACDC.yaml")
