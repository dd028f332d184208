package graft.functions

/** TLS-SNI / HTTP-Host hostname→application resolution — the nDPI
  * hostname engine analog (reference: `src/classifier.c:33` hands
  * hostname-resolved apps to nDPI's suffix tables rather than wire
  * grammars; ROADMAP's tier-1 disposition lists the apps). A
  * registered DOMAIN SUFFIX matches only on a label boundary
  * (`sni == dom` or `sni` ends with `"." + dom`) and the LONGEST
  * matching suffix wins, so `mail.google.com` resolves to gmail while
  * `www.google.com` stays google, and `fakenetflix.com` /
  * `netflix.com.evil.example` resolve to nothing.
  *
  * Lookup is O(#labels) hash probes (walk the label boundaries left to
  * right; the first table hit is the longest suffix) — the same
  * broadcast-table shape as [[SigRules]], fine for a per-row codegen
  * path at any corpus size.
  */
object SniApps {

  /** domain-suffix → app label. Public, widely documented CDN/app
    * domains only (the slice nDPI's own hostname tables carry). */
  val table: Map[String, String] = Map(
    // social
    "facebook.com" -> "facebook", "fbcdn.net" -> "facebook",
    "fbsbx.com" -> "facebook",
    "instagram.com" -> "instagram", "cdninstagram.com" -> "instagram",
    "whatsapp.com" -> "whatsapp", "whatsapp.net" -> "whatsapp",
    "wa.me" -> "whatsapp",
    "twitter.com" -> "twitter", "x.com" -> "twitter",
    "twimg.com" -> "twitter",
    "tiktok.com" -> "tiktok", "tiktokcdn.com" -> "tiktok",
    "snapchat.com" -> "snapchat", "sc-cdn.net" -> "snapchat",
    "reddit.com" -> "reddit", "redd.it" -> "reddit",
    "redditmedia.com" -> "reddit",
    // streaming
    "netflix.com" -> "netflix", "nflxvideo.net" -> "netflix",
    "nflximg.net" -> "netflix", "nflxso.net" -> "netflix",
    "youtube.com" -> "youtube", "googlevideo.com" -> "youtube",
    "ytimg.com" -> "youtube", "youtu.be" -> "youtube",
    "twitch.tv" -> "twitch", "ttvnw.net" -> "twitch",
    "jtvnw.net" -> "twitch",
    "spotify.com" -> "spotify", "scdn.co" -> "spotify",
    // google family (longest suffix specializes over google.com)
    "google.com" -> "google", "gstatic.com" -> "google",
    "googleapis.com" -> "google",
    "mail.google.com" -> "gmail",
    "drive.google.com" -> "gdrive",
    // microsoft family
    "azure.com" -> "azure", "azure.net" -> "azure",
    "office.com" -> "office365", "office365.com" -> "office365",
    "microsoftonline.com" -> "office365",
    "teams.microsoft.com" -> "msteams",
    "skype.com" -> "skype",
    "outlook.com" -> "outlook", "outlook.live.com" -> "outlook",
    "xbox.com" -> "xbox", "xboxlive.com" -> "xbox",
    // infra / commerce
    "amazon.com" -> "amazon",
    "amazonaws.com" -> "aws", "awsstatic.com" -> "aws",
    "cloudflare.com" -> "cloudflare",
    "cloudflare-dns.com" -> "cloudflare",
    "github.com" -> "github", "githubusercontent.com" -> "github",
    "wikipedia.org" -> "wikipedia", "wikimedia.org" -> "wikipedia",
    "speedtest.net" -> "speedtest", "ookla.com" -> "speedtest",
    // messengers / calls
    "zoom.us" -> "zoom",
    "discord.com" -> "discord", "discord.gg" -> "discord",
    "discordapp.com" -> "discord",
    "signal.org" -> "signal",
    "telegram.org" -> "telegram", "t.me" -> "telegram",
    "telegram.me" -> "telegram",
    "viber.com" -> "viber",
    "line.me" -> "line", "line-apps.com" -> "line",
    // gaming
    "steampowered.com" -> "steam", "steamstatic.com" -> "steam",
    "steamcommunity.com" -> "steam",
    "epicgames.com" -> "epicgames", "unrealengine.com" -> "epicgames",
    "playstation.com" -> "psn", "playstation.net" -> "psn",
    // apple
    "apple.com" -> "apple", "icloud.com" -> "apple",
    "mzstatic.com" -> "apple", "apple-dns.net" -> "apple")

  /** Resolve an SNI hostname to its app label, or None. Longest
    * registered suffix on a label boundary wins. */
  def app(sni: String): Option[String] = {
    val s = sni.toLowerCase(java.util.Locale.ROOT).stripSuffix(".")
    var idx = 0
    while (idx <= s.length) {
      val hit = table.get(if (idx == 0) s else s.substring(idx))
      if (hit.isDefined) return hit
      val dot = s.indexOf('.', idx)
      idx = if (dot < 0) s.length + 1 else dot + 1
    }
    None
  }

  /** The q326 gate's test vectors: representative REAL-SHAPED
    * hostnames for the ROADMAP tier-1 disposition list (30 apps), plus
    * three decoys that must NOT resolve — one unknown domain, one
    * non-boundary embedding (`fakenetflix.com`), one prefix attack
    * (`netflix.com.evil.example`). Order is load-bearing: the oracle
    * maps `event_id % size` onto the same list. */
  val gateVectors: IndexedSeq[(String, String)] = IndexedSeq(
    "www.netflix.com" -> "netflix",
    "occ-0-1001-1001.1.nflxvideo.net" -> "netflix",
    "www.youtube.com" -> "youtube",
    "r3---sn-p5qlsnz6.googlevideo.com" -> "youtube",
    "mail.google.com" -> "gmail",
    "drive.google.com" -> "gdrive",
    "www.google.com" -> "google",
    "edge-star-mini-shv-01.facebook.com" -> "facebook",
    "scontent.cdninstagram.com" -> "instagram",
    "mmg.whatsapp.net" -> "whatsapp",
    "api.x.com" -> "twitter",
    "abs.twimg.com" -> "twitter",
    "v16-webapp.tiktok.com" -> "tiktok",
    "www.amazon.com" -> "amazon",
    "s3.us-east-1.amazonaws.com" -> "aws",
    "portal.azure.com" -> "azure",
    "one.one.one.one.cloudflare-dns.com" -> "cloudflare",
    "outlook.office365.com" -> "office365",
    "teams.microsoft.com" -> "msteams",
    "edge.skype.com" -> "skype",
    "us04web.zoom.us" -> "zoom",
    "gateway.discord.gg" -> "discord",
    "app.snapchat.com" -> "snapchat",
    "oauth.reddit.com" -> "reddit",
    "en.wikipedia.org" -> "wikipedia",
    "api.github.com" -> "github",
    "open.spotify.com" -> "spotify",
    "www.speedtest.net" -> "speedtest",
    "chat.signal.org" -> "signal",
    "web.telegram.org" -> "telegram",
    "media.viber.com" -> "viber",
    "obs.line-apps.com" -> "line",
    "usher.ttvnw.net" -> "twitch",
    "store.steampowered.com" -> "steam",
    "launcher.epicgames.com" -> "epicgames",
    "auth.api.playstation.com" -> "psn",
    "login.xboxlive.com" -> "xbox",
    "gsp-ssl.ls.apple.com" -> "apple",
    "setup.icloud.com" -> "apple",
    // decoys — must stay bare "tls" (SNI extracted, no app resolved)
    "decoy.graft.example" -> "tls",
    "fakenetflix.com" -> "tls",
    "netflix.com.evil.example" -> "tls")
}
