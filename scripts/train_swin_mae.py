"""Entry script (reference counterpart: 2022_12_CVPR_Swin-MAE.py)."""

from run import run

if __name__ == "__main__":
    run("configs/swinmae_30k_224x224_ACDC.yaml")
