from .h5 import append_to_h5, save_predictions, read_dataset, dataset_len

__all__ = ["append_to_h5", "save_predictions", "read_dataset", "dataset_len"]
