from .etl import prepare_dataset, create_label_dataset, read_txt_file  # noqa: F401
from .image_dataset import ImgDataset, collate_batch  # noqa: F401
