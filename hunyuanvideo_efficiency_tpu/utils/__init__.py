from .data_utils import align_to
from .file_utils import save_videos_grid
