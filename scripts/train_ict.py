"""Entry script (reference counterpart: 2022_02_ISBI_ICT-MedSeg_ACDC.py)."""

from run import run

if __name__ == "__main__":
    run("configs/ict-medseg_unet_30k_224x224_ACDC.yaml")
