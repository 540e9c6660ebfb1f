"""Identity -> crawler-config rendering (C22).

Reference parity: runners/get_conf_file.py:180-202 substitutes identity
row fields into the JS conf template
(identities/make_conf/conf_template.txt) via string.Template.  The
Spark form is one ``format_string`` projection — template substitution
is a pure column expression, rendered for millions of identities in one
codegen stage instead of one file write per iid.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The substituted skeleton of conf_template.txt (fields the engine
# models; the full template adds more value arrays in the same shape).
CONF_TEMPLATE = (
    "//\n"
    "// IID: %s\n"
    "//\n"
    "exports.fields = {\n"
    '    username: ["%s"],\n'
    '    email: ["%s"],\n'
    '    password: ["%s"],\n'
    "};\n"
    "exports.requiredSet = {email: true, password: true};\n"
)


def render_conf(iid: Column, username: Column, email: Column, password: Column) -> Column:
    """One rendered JS conf per identity row."""
    return F.format_string(
        CONF_TEMPLATE,
        iid.cast("string"),
        username.cast("string"),
        email.cast("string"),
        password.cast("string"),
    )
