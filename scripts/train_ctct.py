"""Entry script (reference counterpart: 2021_12_MIDL_CTCT_ACDC.py)."""

from run import run

if __name__ == "__main__":
    run("configs/ctct_unet_segformer_30k_224x224_ACDC.yaml")
