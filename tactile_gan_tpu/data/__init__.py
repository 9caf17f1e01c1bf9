from tactile_gan_tpu.data.augment import preprocess_batch
from tactile_gan_tpu.data.dataset import PairedDataset, get_dataset
from tactile_gan_tpu.data.pairing import list_images, tactile_paths_for
