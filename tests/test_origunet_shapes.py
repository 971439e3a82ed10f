"""Static shape math: derived UNet sizes equal the reference's hardcoded ones."""

from evfly_tpu.models.origunet import _unet_sizes


def test_260x346_matches_reference_constants():
    skip_sizes, middle, decoded = _unet_sizes(260, 346)
    # learner_models.py:558-580 hardcoded (big, small) per decoder level
    assert skip_sizes[0] == ((25, 35), (16, 26))
    assert skip_sizes[1] == ((58, 79), (24, 44))
    assert skip_sizes[2] == ((124, 167), (40, 80))
    assert skip_sizes[3] == ((256, 342), (72, 152))
    assert middle == (8, 13)      # middle_shape (learner_models.py:394)
    assert decoded == (68, 148)   # decoded_shape (learner_models.py:419)


def test_min_dryrun_size_valid():
    _skips, middle, decoded = _unet_sizes(188, 196)
    assert middle[0] >= 4 and middle[1] >= 4
    assert decoded[0] >= 1 and decoded[1] >= 1
