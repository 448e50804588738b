from mapreducegcp_spark.functions.text import tokens, words_of  # noqa: F401
from mapreducegcp_spark.functions.vectors import cosine, dot, l2_norm  # noqa: F401
