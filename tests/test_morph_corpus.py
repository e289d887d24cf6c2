"""randomize_fc (morphology-only corpus): per-call frequency bands vary
within a species, while the default corpus keeps them fixed
(ATTRIBUTION_r5 leak control; data/synthetic.synth_hard_recording)."""

import numpy as np

from birdsoundclassif_tpu.data.synthetic import (
    species_bank,
    synth_hard_recording,
)


def _bands(spec, rng, randomize_fc):
    _, annots = synth_hard_recording(
        spec, 20.0, 6, rng, interference_p=0.0, randomize_fc=randomize_fc)
    return [(round(a[2]), round(a[3])) for a in annots]


def test_default_corpus_fixes_the_band_per_species():
    rng = np.random.default_rng(0)
    spec = species_bank(["Turdus merula"], rng)[0]
    bands = _bands(spec, rng, randomize_fc=False)
    assert len(bands) >= 4
    assert len(set(bands)) == 1  # the positional leak: band == species

    want = (round(spec["fc"] - spec["bw"] / 2),
            round(spec["fc"] + spec["bw"] / 2))
    assert bands[0] == want


def test_randomize_fc_varies_band_per_call():
    rng = np.random.default_rng(0)
    spec = species_bank(["Turdus merula"], rng)[0]
    bands = _bands(spec, rng, randomize_fc=True)
    assert len(bands) >= 4
    assert len(set(bands)) == len(bands)  # every call a fresh band
    for lo, hi in bands:
        assert hi - lo == round(spec["bw"] / 2) * 2 or abs(
            (hi - lo) - spec["bw"]) < 2  # bandwidth is still the species'


def test_default_rng_sequence_unchanged():
    """The new keyword must not consume extra rng draws on the default
    path — scripts/rebuild_eval_corpus.py reconstructs the r4 bank and
    recordings from the same seed."""
    rng_a = np.random.default_rng(7)
    spec_a = species_bank(["Parus major"], rng_a)[0]
    sig_a, ann_a = synth_hard_recording(spec_a, 10.0, 3, rng_a)
    rng_b = np.random.default_rng(7)
    spec_b = species_bank(["Parus major"], rng_b)[0]
    sig_b, ann_b = synth_hard_recording(spec_b, 10.0, 3, rng_b,
                                        randomize_fc=False)
    assert ann_a == ann_b
    np.testing.assert_array_equal(sig_a, sig_b)
