"""Small standalone CLIs (reference ``netdissect/tool/``): makesample,
ganseg, allunitsample."""
