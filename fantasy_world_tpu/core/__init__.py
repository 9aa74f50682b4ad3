from .dtypes import Policy, DEFAULT_POLICY
from .params import ParamSpec, init_linear, init_layernorm, count_params
