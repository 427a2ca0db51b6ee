from dsic_tpu.data.datasets import FolderImages, make_loaders, split_paths
from dsic_tpu.data.synthetic import synthetic_patches, write_synthetic_dataset
from dsic_tpu.data.bands import (
    merge_bands, create_rgb_from_pngs, process_all_patches)

__all__ = ["FolderImages", "make_loaders", "split_paths", "synthetic_patches",
           "write_synthetic_dataset", "merge_bands", "create_rgb_from_pngs",
           "process_all_patches"]
