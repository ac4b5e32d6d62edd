"""SDS subsystem (VERDICT r2 missing #9): streaming session,
barge-in, module interface, E2E speech-to-speech."""

import numpy as np

from espnet_tpu.sds.session import DialogueSession, Event, StreamingVAD


def tone(n, f=440.0, fs=16000, amp=0.3):
    return (amp * np.sin(2 * np.pi * f * np.arange(n) / fs)).astype(
        np.float32)


def silence(n):
    return np.zeros((n,), np.float32)


def make_session(tts_len=8000, **kw):
    calls = {"asr": 0, "tts": 0}

    def asr_fn(wav):
        calls["asr"] += 1
        return f"utt{calls['asr']} {len(wav)}"

    def tts_fn(text):
        calls["tts"] += 1
        return tone(tts_len, f=880.0)

    sess = DialogueSession(asr_fn=asr_fn, tts_fn=tts_fn, **kw)
    return sess, calls


def feed(sess, wav, chunk=1600):
    evs = []
    for i in range(0, len(wav), chunk):
        evs.extend(sess.feed_chunk(wav[i:i + chunk]))
    return evs


def test_streaming_vad_attack_and_hangover():
    vad = StreamingVAD(attack_frames=2, hangover_frames=3)
    d1 = vad.feed(silence(16000))
    assert not any(d1)
    d2 = vad.feed(tone(16000))
    assert any(d2) and not d2[0]       # attack delay
    d3 = vad.feed(silence(16000))
    assert d3[0] and not d3[-1]        # hangover then release


def test_turn_cycle_events():
    """silence -> speech -> silence yields speech_start, endpoint, asr,
    response, speak events; ASR receives (roughly) the spoken span."""
    sess, calls = make_session()
    evs = feed(sess, np.concatenate(
        [silence(8000), tone(16000), silence(8000)]))
    kinds = [e.kind for e in evs]
    for k in ("speech_start", "endpoint", "asr", "response", "speak"):
        assert k in kinds, kinds
    assert calls["asr"] == 1 and calls["tts"] == 1
    asr_ev = next(e for e in evs if e.kind == "asr")
    n = int(asr_ev.text.split()[1])
    assert 12000 <= n <= 26000          # spoken span +- pre-roll/hangover
    # response audio is streamed in chunks totalling the TTS output
    total = sum(len(e.wav) for e in evs if e.kind == "speak")
    assert 0 < total <= 8000
    # keep feeding silence: rest of the response drains, back to LISTENING
    evs2 = feed(sess, silence(16000))
    total += sum(len(e.wav) for e in evs2 if e.kind == "speak")
    assert total == 8000
    assert sess.state == "LISTENING"
    assert sess.history and sess.history[0]["user"].startswith("utt1")


def test_barge_in_interrupts_speaking():
    sess, calls = make_session(tts_len=80000)
    feed(sess, np.concatenate([silence(8000), tone(16000), silence(8000)]))
    assert sess.state == "SPEAKING"
    evs = feed(sess, tone(16000, f=330.0))
    kinds = [e.kind for e in evs]
    assert "interrupted" in kinds
    assert sess._speak_queue is None
    # the interrupting speech becomes the next user turn
    evs2 = feed(sess, silence(8000))
    assert any(e.kind == "asr" for e in evs2)
    assert calls["asr"] == 2


def test_no_barge_in_mode():
    sess, calls = make_session(tts_len=80000, allow_barge_in=False)
    feed(sess, np.concatenate([silence(8000), tone(16000), silence(8000)]))
    evs = feed(sess, tone(8000, f=330.0))
    assert not any(e.kind == "interrupted" for e in evs)
    assert any(e.kind == "speak" for e in evs)


def test_interface_cascade_and_llm_options():
    from espnet_tpu.sds.interface import SDSInterface
    iface = SDSInterface()
    echo = iface.handle_LLM_selection("echo")
    assert echo("hello", []) == "hello"
    rev = iface.handle_LLM_selection("reverse")
    assert rev("a b c", []) == "c b a"
    custom = iface.handle_LLM_selection(lambda t, h: t.upper())
    assert custom("hi", []) == "HI"
    # session with stub modules via the DialogueSession contract
    sess = DialogueSession(asr_fn=lambda w: "x", tts_fn=lambda t: tone(800),
                           respond_fn=rev)
    evs = feed(sess, np.concatenate(
        [silence(8000), tone(16000), silence(8000)]))
    assert any(e.kind == "speak" for e in evs)


def test_e2e_speechlm_codec_dialogue(tmp_path):
    """E2E path: tiny codec + tiny SpeechLM, speech in -> speech out
    through SpeechLMCodecE2E inside a DialogueSession."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ts", "tests/test_speechlm.py")
    ts = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ts)
    from espnet_tpu.tasks.speechlm import SpeechLMTask
    from espnet_tpu.tasks.ssl import CodecTask
    jsons, tl = ts._toy_multitask(tmp_path)
    SpeechLMTask.main({
        "output_dir": str(tmp_path / "exp"),
        "multi_task_dataset": jsons, "valid_multi_task_dataset": jsons,
        "text_token_list": tl, "codebook_size": 8, "n_streams": 2,
        "d_model": 16, "heads": 2, "units": 32, "layers": 1,
        "batch_size": 3, "max_epoch": 1, "log_interval": 5,
        "train_data_path_and_name_and_type": [],
        "valid_data_path_and_name_and_type": []})
    ts._write_wavs(tmp_path)
    CodecTask.main({
        "output_dir": str(tmp_path / "codec_exp"), "fs": 8000,
        "codec_conf": {"channels": 8, "strides": (2, 4), "code_dim": 16,
                       "num_quantizers": 2, "codebook_size": 8},
        "batch_size": 2, "max_epoch": 1, "log_interval": 5,
        "collate_fixed_lengths": {"speech": 512},
        "train_data_path_and_name_and_type": [
            str(tmp_path / "wav.scp") + ",speech,sound"],
        "valid_data_path_and_name_and_type": [
            str(tmp_path / "wav.scp") + ",speech,sound"]})
    from espnet_tpu.sds.e2e import SpeechLMCodecE2E
    e2e = SpeechLMCodecE2E(
        train_config=tmp_path / "exp" / "config.yaml",
        model_file=next((tmp_path / "exp").glob("*best")),
        codec_train_config=tmp_path / "codec_exp" / "config.yaml",
        codec_model_file=next((tmp_path / "codec_exp").glob("*best")),
        steps=12, fs=8000)
    out = e2e.forward(tone(4000, fs=8000))
    assert out.ndim == 1 and np.isfinite(out).all()
    # inside a session: the E2E wiring from SDSInterface.build_session
    sess = DialogueSession(
        asr_fn=lambda wav: e2e.set_user_audio(wav),
        tts_fn=lambda _t: e2e.respond_audio(),
        vad=StreamingVAD(fs=8000), fs=8000)
    evs = feed(sess, np.concatenate(
        [silence(4000), tone(8000, fs=8000), silence(4000)]), chunk=800)
    assert any(e.kind == "speak" for e in evs) or \
        any(e.kind == "response" for e in evs)
