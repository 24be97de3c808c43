from fnssl_tpu.runtime.export import (ServingModel, export_model,
                                      load_artifact)
from fnssl_tpu.runtime.streaming import StreamingLocalizer
