"""CLI flag surface -> typed config mapping."""

import pytest

from htr_vt_tpu.cli.args import args_to_config, build_parser


def parse(argv):
    return args_to_config(build_parser("t").parse_args(argv))


def test_reference_iam_recipe_flags():
    cfg = parse(["IAM", "--max-lr", "1e-3", "--train-bs", "128", "--val-bs", "8",
                 "--weight-decay", "0.5", "--mask-ratio", "0.4",
                 "--max-span-length", "8", "--img-size", "512", "64",
                 "--total-iter", "100000"])
    assert cfg.model.nb_cls == 80           # IAM preset
    assert cfg.model.img_size == (64, 512)  # CLI order is W H like the reference
    assert cfg.model.num_tokens == 128
    assert cfg.model.masking.ratio == 0.4
    assert cfg.model.masking.max_span_length == 8
    assert cfg.optim.max_lr == 1e-3 and cfg.optim.weight_decay == 0.5
    assert cfg.optim.total_iters == 100000
    assert cfg.data.train_bs == 128


def test_dataset_presets():
    assert parse(["READ"]).model.nb_cls == 90
    assert parse(["LAM"]).model.nb_cls == 90
    assert parse(["LAM"]).data.train_list == "./data/LAM/train.ln"
    assert parse(["SYNTH"]).data.dataset == "SYNTH"


def test_variant_presets_applied():
    cfg = parse(["IAM", "--encoder", "window"])
    assert cfg.model.use_abs_pos_embed is False
    assert cfg.model.logit_layer_norm is False
    cfg = parse(["IAM", "--encoder", "lgp"])
    assert cfg.model.depth == 3
    cfg = parse(["IAM", "--encoder", "van2"])
    assert cfg.model.stem == "van2"


def test_sgm_and_ed_flags():
    cfg = parse(["IAM", "--sgm-enable", "--sgm-detach", "--sgm-lambda", "0.7",
                 "--ctc-lambda", "0.2"])
    assert cfg.model.sgm.enable and cfg.model.sgm.detach_features
    assert cfg.model.sgm.sgm_lambda == 0.7 and cfg.model.sgm.ctc_lambda == 0.2

    cfg = parse(["IAM", "--model-type", "encoder_decoder", "--decoder-layers",
                 "4", "--max-seq-len", "128", "--label-smoothing", "0.2"])
    assert cfg.model.model_type == "encoder_decoder"
    assert cfg.model.decoder_layers == 4
    assert cfg.model.max_seq_len == 128
    assert cfg.model.label_smoothing == 0.2


def test_augment_and_misc_flags():
    cfg = parse(["IAM", "--proj", "6", "--dila-ero-max-kernel", "2",
                 "--jitter-brightness", "0.3", "--no-augment",
                 "--vietnamese-charset", "--tri-masked",
                 "--resume", "/x/checkpoint_0.1_0.2_5"])
    a = cfg.data.augment
    assert a.proj == 6 and a.dila_ero_max_kernel == 2
    assert a.jitter_brightness == 0.3 and a.enable is False
    assert cfg.data.vietnamese_charset
    assert cfg.train.tri_masked
    assert cfg.train.resume == "/x/checkpoint_0.1_0.2_5"


def test_config_roundtrip_dict():
    from htr_vt_tpu.config import ExperimentConfig, config_from_dict, config_to_dict
    cfg = parse(["READ", "--encoder", "conformer", "--mask-mode", "mms"])
    d = config_to_dict(cfg)
    back = config_from_dict(ExperimentConfig, d)
    assert back == cfg
