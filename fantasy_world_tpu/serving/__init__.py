from .server import BatchWorker, GenerationServer, Job  # noqa: F401
