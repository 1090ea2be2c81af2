"""Schema: field types and the field registry.

Reference equivalents: server/field/FieldDef.java:22 (hierarchy),
server/field/FieldDefCreator.java:48-75 (registry of built-in types),
server/field/properties/ (capability traits).
"""

from nrtsearch_tpu.schema.fields import (
    FieldDef,
    FieldType,
    create_field_def,
    register_field_type,
)

__all__ = ["FieldDef", "FieldType", "create_field_def", "register_field_type"]
