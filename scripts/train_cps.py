"""Entry script (reference counterpart: 2021_06_CVPR_CPS_ACDC.py)."""

from run import run

if __name__ == "__main__":
    run("configs/cps_unet_30k_224x224_ACDC.yaml")
