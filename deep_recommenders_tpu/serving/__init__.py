from deep_recommenders_tpu.serving.export import (
    ServingModule,
    export_model,
    load_serving_module,
)
