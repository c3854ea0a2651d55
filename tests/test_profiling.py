import time

from extended_gan_tpu.utils.profiling import StepTimer, annotate
from extended_gan_tpu.utils.term import render_image, term_display

import numpy as np


def test_step_timer_stats():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            time.sleep(0.01)
    s = t.stats()
    assert s["steps"] == 3
    assert 0.005 < s["mean_s"] < 0.1
    assert s["steps_per_sec"] > 0


def test_annotate_context():
    with annotate("unit-test-region"):
        pass


def test_term_render():
    img = np.linspace(0, 1, 64).reshape(8, 8)
    out = render_image(img, width=8)
    assert "\x1b[" in out and "▀" in out


def test_term_display_side_by_side(capsys):
    y = np.random.RandomState(0).rand(1, 8, 8)
    out = term_display(y, y, width=8)
    assert "y_hat" in out
