"""Deterministic MediaWiki fixture — the S3/S4 "API" store.

Pages carry raw wikitext with the constructs ``clean_wikitext`` (P12)
must strip: nested templates, tables, refs, wiki links, categories,
files, bold/italic runs, end sections — plus redirects, non-main
namespaces, stubs, and unsafe titles for the F15/F16 gates.
"""

from __future__ import annotations

import random

_TOPICS = (
    "histoire géographie science musique peinture littérature astronomie "
    "botanique architecture navigation montagne rivière forêt village"
).split()


def generate_wiki_pages(seed: int = 42, n_pages: int = 60,
                        base_url: str = "http://wiki.example.org/wiki") -> dict[int, dict]:
    rng = random.Random(seed)
    store: dict[int, dict] = {}
    for pid in range(1, n_pages + 1):
        topic = rng.choice(_TOPICS)
        title = f"{topic.capitalize()} {pid}"
        ns, redirect, unsafe, stub = 0, False, False, False
        if pid % 13 == 0:
            ns = 1  # talk namespace → F16 drop
        if pid % 11 == 0:
            redirect = True
        if pid % 17 == 0:
            unsafe = True
            title = f"Catastrophe de {topic} {pid}"
        if pid % 19 == 0:
            stub = True

        body_sentences = [
            f"Le sujet {topic} numéro {pid} est décrit ici en détail avec "
            f"beaucoup de contexte ({rng.randint(1000, 9999)})."
            for _ in range(3 if not stub else 0)
        ]
        wikitext = (
            "{{Infobox sujet|nom=" + title + "|type={{lien|" + topic + "}}}}\n"
            + f"'''{title}''' est un article.\n"
            + " ".join(body_sentences) + "\n"
            + "Voir [[Article lié|le lien]] et [[Autre]].\n"
            + "{| class=\"wikitable\"\n|cell\n|}\n"
            + "<ref name=\"a\">Une référence</ref><ref/>\n"
            + "[[Catégorie:Test]][[Fichier:Image.png|thumb]]\n"
            + "== Détails ==\nPlus de texte descriptif pour la section "
            + f"numérotée {pid} qui allonge l'article de façon utile.\n"
            + "== Références ==\n* source une\n* source deux\n"
        )
        store[pid] = {
            "page_id": pid, "title": title, "ns": ns, "redirect": redirect,
            "url": f"{base_url}/{title.replace(' ', '_')}",
            "wikitext": wikitext if not stub else "{{ébauche}} court.",
            "thumbnail": f"http://wiki.example.org/img/{pid}.png" if pid % 2 == 0 else None,
        }
    return store
