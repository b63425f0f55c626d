"""Loader dispatch (reference build_loader, datasets/builder.py:9-77).

Maps the config's ``datasets`` string to loader factories:
  * SSL 3-loader datasets: acdc, lidc, synapse, isic → (label, unlabel, test)
  * supervised 2-loader:   sup_acdc, sup_lidc, sup_synapse, sup_isic → (train, test)
  * sup_building → (train, val, test)
"""

from __future__ import annotations


def build_loader(cfg, seed: int | None = None):
    name = str(cfg.datasets).lower()
    seed = int(cfg.get("seed", 0) if seed is None else seed)
    crop = tuple(cfg.train_crop_size)

    if name == "acdc":
        from hpfg_tpu.data.acdc import get_ssl_acdc_loader

        return get_ssl_acdc_loader(cfg.data_path, cfg.batch_size,
                                   cfg.unlabel_batch_size, crop,
                                   cfg.label_num, seed,
                                   device_augment=bool(
                                       cfg.get("device_augment", False)))
    if name == "sup_acdc":
        from hpfg_tpu.data.acdc import get_acdc_loader

        return get_acdc_loader(cfg.data_path, cfg.batch_size, crop, seed,
                               device_augment=bool(
                                   cfg.get("device_augment", False)))
    if name == "lidc":
        from hpfg_tpu.data.lidc import get_ssl_lidc_loader

        return get_ssl_lidc_loader(cfg.data_path, cfg.batch_size,
                                   cfg.unlabel_batch_size, crop,
                                   cfg.label_num, seed)
    if name == "sup_lidc":
        from hpfg_tpu.data.lidc import get_lidc_loader

        return get_lidc_loader(cfg.data_path, cfg.batch_size, crop, seed)
    if name == "isic":
        from hpfg_tpu.data.isic import get_ssl_isic_loader

        return get_ssl_isic_loader(cfg.data_path, cfg.batch_size,
                                   cfg.unlabel_batch_size, crop,
                                   cfg.label_num, seed)
    if name == "sup_isic":
        from hpfg_tpu.data.isic import get_isic_loader

        return get_isic_loader(cfg.data_path, cfg.batch_size, crop, seed)
    if name == "synapse":
        from hpfg_tpu.data.synapse import get_ssl_synapse_loader

        return get_ssl_synapse_loader(cfg.data_path, cfg.batch_size,
                                      cfg.unlabel_batch_size, crop,
                                      cfg.label_num, seed)
    if name == "sup_synapse":
        from hpfg_tpu.data.synapse import get_synapse_loader

        return get_synapse_loader(cfg.data_path, cfg.batch_size, crop, seed)
    if name == "sup_building":
        from hpfg_tpu.data.building import get_building_loader

        return get_building_loader(cfg.data_path, cfg.batch_size, crop, seed)
    raise ValueError(f"unknown datasets {cfg.datasets!r}")
