from stylesinger_tpu.serving.export import (  # noqa: F401
    export_synthesizer, load_synthesizer, make_synthesize_fn,
    save_synthesizer,
)
