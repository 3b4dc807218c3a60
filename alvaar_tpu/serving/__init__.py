from alvaar_tpu.serving.server import SlamServer, SlamClient  # noqa: F401
