import os

import numpy as np
import pytest

from extended_gan_tpu.data.io import save_array
from extended_gan_tpu.data.streaming import AraiLoader


def test_arai_corrupt_file_raises_not_truncates(tmp_path):
    """A corrupt file must surface as an error, not a silently short epoch
    (code-review finding: the producer thread used to swallow it)."""
    d = tmp_path / "training"
    os.makedirs(d)
    good = np.random.RandomState(0).rand(12, 5, 1, 8, 8).astype(np.float32)
    save_array(str(d / "0.pt"), good)
    with open(d / "1.pt", "wb") as f:
        f.write(b"not a tensor file at all")
    loader = AraiLoader(4, str(d), total_length=24, n_regions=5,
                        downsample_size=(8, 8))
    batches = 0
    with pytest.raises(Exception) as excinfo:
        for _x, _y in loader:
            batches += 1
    # the GOOD file streamed first (3 batches of <=4 from 5 windows), THEN
    # the corrupt one surfaced — not an unrelated crash at construction
    assert batches >= 1, "good file never streamed"
    assert not isinstance(excinfo.value, StopIteration)
