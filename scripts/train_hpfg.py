"""Entry script (reference counterpart: main.py (HPFG flagship))."""

from run import run

if __name__ == "__main__":
    run("configs/hpfg_unet_plus_30k_224x224_ACDC.yaml")
