"""Scripting: js-expression subset compiled to jax expressions.

Reference equivalent: server/script/ — ScriptService with ScoreScript /
FacetScript / RuntimeScript contexts, whose built-in engine is Lucene's
javascript expression compiler (JsScriptEngine.java:60-76 compiles to JVM
bytecode). Here the same expression language compiles to a closure of jnp
operations over dense doc-value columns — it runs vectorized over the whole
segment at once instead of per-document.
"""

from nrtsearch_tpu.script.expr import compile_expression

__all__ = ["compile_expression"]
