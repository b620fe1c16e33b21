"""Bundled default YAML configs (installed copies of repo-root config/).

Kept byte-identical to config/*.yaml by tests/test_scripts.py so an
installed tree and a source checkout resolve the same defaults.
"""
import os

CONFIG_DIR = os.path.dirname(os.path.abspath(__file__))
