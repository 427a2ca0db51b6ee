from dsic_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, latest_step
from dsic_tpu.utils.csv_logger import CsvLogger
from dsic_tpu.utils.image_io import load_image, save_image, list_images

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step",
           "CsvLogger", "load_image", "save_image", "list_images"]
