"""Entry script (reference counterpart: 2017_03_NIPS_Mean-Teacher_ACDC.py)."""

from run import run

if __name__ == "__main__":
    run("configs/mean_teacher_unet_30k_224x224_ACDC.yaml")
