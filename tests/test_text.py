from stylesinger_tpu.text import PAD_ID, EOS_ID, UNK_ID, TokenTextEncoder


def test_reserved_ids():
    enc = TokenTextEncoder.build(["a", "b", "c"])
    assert enc.pad() == PAD_ID == 0
    assert enc.eos() == EOS_ID == 1
    assert enc.unk() == UNK_ID == 2


def test_encode_decode_roundtrip():
    enc = TokenTextEncoder.build(["ni", "hao", "shi", "jie", "|"])
    ids = enc.encode("ni hao | shi jie")
    assert enc.decode(ids) == "ni hao | shi jie"


def test_oov_maps_to_unk():
    enc = TokenTextEncoder.build(["a"])
    assert enc.encode("zzz") == [UNK_ID]


def test_file_roundtrip(tmp_path):
    enc = TokenTextEncoder.build(["b", "a", "c"])
    path = str(tmp_path / "phone_set.json")
    enc.store_to_file(path)
    enc2 = TokenTextEncoder.from_file(path)
    assert len(enc2) == len(enc)
    assert enc2.encode("a b c") == enc.encode("a b c")


def test_reference_phone_set_loads():
    # the 58-phone ZH set shipped with the reference checkpoint
    enc = TokenTextEncoder.from_file(
        "/root/reference/ZH_checkpoint_phone_set.json")
    assert len(enc) >= 58
    assert enc.encode("a")[0] >= 3


def test_sil_phonemes():
    enc = TokenTextEncoder.build(["a", "|", "<SIL>"])
    sils = enc.sil_phonemes()
    assert "|" in sils and "<SIL>" in sils and "a" not in sils


# ------------------------------------------------------------ processors

def test_split_pinyin():
    from stylesinger_tpu.text_processors import split_pinyin
    assert split_pinyin("xiao") == ["x", "iao"]
    assert split_pinyin("zhang") == ["zh", "ang"]
    assert split_pinyin("ang") == ["ang"]
    assert split_pinyin("hao3") == ["h", "ao3"]
    assert split_pinyin("er") == ["er"]


def test_num_to_hanzi():
    from stylesinger_tpu.text_processors import num_to_hanzi
    assert num_to_hanzi("0") == "零"
    assert num_to_hanzi("15") == "十五"
    assert num_to_hanzi("230") == "二百三十"
    assert num_to_hanzi("1005") == "一千零五"
    assert num_to_hanzi("20000") == "二万"


def test_zh_processor():
    from stylesinger_tpu.text_processors import get_txt_processor_cls
    phs, norm = get_txt_processor_cls("zh").process("x iao AP j iu")
    assert phs == ["x", "iao", "AP", "j", "iu"]
    phs, norm = get_txt_processor_cls("zh").process("xiao jiu wo")
    assert phs == ["x", "iao", "j", "iu", "w", "o"]
    from stylesinger_tpu.text_processors import normalize_zh
    assert "百分之一百" in normalize_zh("100%")


def test_en_processor():
    from stylesinger_tpu.text_processors import get_txt_processor_cls
    phs, norm = get_txt_processor_cls("en").process("hello world")
    assert len(phs) > 4
    assert "|" in phs
