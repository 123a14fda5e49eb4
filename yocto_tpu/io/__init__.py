"""IO layer: image codecs (PNG/JPG via PIL, HDR/PFM/EXR native), model
parsers (PLY/OBJ/STL/pbrt/glTF) and scene IO (JSON schema-compatible with
the reference)."""
