"""DINT dictionary mining, dictionary structures, and block codecs."""
