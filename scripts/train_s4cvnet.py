"""Entry script (reference counterpart: 2022_08_CVPR_S4CVNet_ACDC.py)."""

from run import run

if __name__ == "__main__":
    run("configs/s4cvnet_unet_30k_224x224_ACDC.yaml")
