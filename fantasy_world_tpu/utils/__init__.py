from .observability import (Metrics, StepTimer, get_logger, metrics,
                            profile_trace)
