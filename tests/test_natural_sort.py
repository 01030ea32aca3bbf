"""Ports of the reference's pure-function tests for the natural ordering.

Vectors from /root/reference/src/common/sort_test.go:5-47.
"""

from simple_osm_queries_ray.functions.natural_sort import is_less_than, natural_sorted


def test_sort_only_numbers():
    assert natural_sorted(["3", "2", "2.5", "1", "-1", "0"]) == ["-1", "0", "1", "2", "2.5", "3"]


def test_sort_numbers_with_string_suffix():
    assert natural_sorted(["1a", "1b", "2c", "1", "2"]) == ["1", "1a", "1b", "2", "2c"]


def test_sort_numbers_and_strings():
    assert natural_sorted(["1a", "a", "b", "1", "2"]) == ["1", "1a", "2", "a", "b"]


def test_sort_only_strings():
    assert natural_sorted(["a", "foo", "bar", "b"]) == ["a", "b", "bar", "foo"]


def test_is_less_than_number_beats_suffixed():
    assert is_less_than("1", "1a")
    assert not is_less_than("1a", "1")


def test_trimming():
    assert natural_sorted([" b ", "a"]) == ["a", "b"]
