"""Entry script (reference counterpart: sup_ACDC.py)."""

from run import run

if __name__ == "__main__":
    run("configs/unet_30k_224x224_ACDC.yaml")
