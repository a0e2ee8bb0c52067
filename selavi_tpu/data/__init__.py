from selavi_tpu.data.loader import DataLoader, device_prefetch
from selavi_tpu.data.synthetic import SyntheticAVDataset

__all__ = ["DataLoader", "device_prefetch", "SyntheticAVDataset"]
