from tcsfm.data.windows import build_windows  # noqa: F401
from tcsfm.data.dataset import SfMWindowDataset, SequenceData  # noqa: F401
from tcsfm.data.loader import BatchLoader, collate_windows  # noqa: F401
from tcsfm.data.synthetic import make_synthetic_sequence  # noqa: F401
